"""Generate a BASELINE-config-2-shaped benchmark dataset (no egress).

SwissProt-like target set: N protein sequences with lengths drawn from a
log-normal fit of SwissProt (median ~292, mean ~360) and letters drawn from
the blosum62 background distribution; planted family structure (each family
= one ancestor mutated at 15-45% of positions) so searches have real
homologs to rank, like the reference regression datasets.

Queries: mutated fragments of random targets (point substitutions +
terminal truncation), plus 10% unrelated randoms.

Usage: python experiments/make_scale_db.py OUTDIR [n_targets] [n_queries]
"""

import pathlib
import sys

import numpy as np

AA = "ARNDCQEGHILKMFPSTWYV"
# blosum62 background probabilities (Robinson&Robinson order ARNDCQEGHILKMFPSTWYV)
PBACK = np.array([0.0789, 0.0540, 0.0448, 0.0536, 0.0125, 0.0402, 0.0669,
                  0.0716, 0.0219, 0.0566, 0.0977, 0.0594, 0.0239, 0.0396,
                  0.0484, 0.0684, 0.0541, 0.0113, 0.0306, 0.0656])
PBACK = PBACK / PBACK.sum()


def lengths(rng, n):
    ln = rng.lognormal(mean=5.68, sigma=0.55, size=n)
    return np.clip(ln, 50, 2000).astype(np.int64)


def write_fasta(path, names, seqs):
    aa = np.frombuffer(AA.encode(), dtype=np.uint8)
    with open(path, "w") as f:
        for name, s in zip(names, seqs):
            f.write(f">{name}\n{aa[s].tobytes().decode()}\n")


def main(outdir, n_targets=100_000, n_queries=1_000, seed=7):
    rng = np.random.default_rng(seed)
    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)

    n_fam = max(n_targets // 8, 1)       # ~8 members per family
    fam_lens = lengths(rng, n_fam)
    ancestors = [rng.choice(20, size=L, p=PBACK) for L in fam_lens]

    tseqs, tnames = [], []
    for i in range(n_targets):
        f = int(rng.integers(n_fam))
        anc = ancestors[f]
        rate = rng.uniform(0.15, 0.45)
        s = anc.copy()
        mut = rng.random(len(s)) < rate
        s[mut] = rng.choice(20, size=int(mut.sum()), p=PBACK)
        # occasional indel-ish truncation
        if rng.random() < 0.3:
            lo = int(rng.integers(0, max(len(s) // 4, 1)))
            hi = len(s) - int(rng.integers(0, max(len(s) // 4, 1)))
            s = s[lo:max(hi, lo + 50)]
        tseqs.append(s.astype(np.uint8))
        tnames.append(f"T{i}_fam{f}")
    write_fasta(out / "targets.fasta", tnames, tseqs)

    qseqs, qnames = [], []
    for i in range(n_queries):
        if rng.random() < 0.1:
            L = int(lengths(rng, 1)[0])
            qseqs.append(rng.choice(20, size=L, p=PBACK).astype(np.uint8))
            qnames.append(f"Q{i}_random")
            continue
        t = int(rng.integers(n_targets))
        s = tseqs[t].copy()
        rate = rng.uniform(0.1, 0.35)
        mut = rng.random(len(s)) < rate
        s[mut] = rng.choice(20, size=int(mut.sum()), p=PBACK)
        if rng.random() < 0.5 and len(s) > 120:
            lo = int(rng.integers(0, len(s) // 3))
            s = s[lo:lo + max(len(s) // 2, 100)]
        qseqs.append(s.astype(np.uint8))
        qnames.append(f"Q{i}_from_T{t}")
    write_fasta(out / "queries.fasta", qnames, qseqs)
    print(f"wrote {n_targets} targets ({sum(len(s) for s in tseqs)} aa), "
          f"{n_queries} queries -> {out}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "/tmp/mmseqs2_scale",
         int(args[1]) if len(args) > 1 else 100_000,
         int(args[2]) if len(args) > 2 else 1_000)
