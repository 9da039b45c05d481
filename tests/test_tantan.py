"""tantan masking parity vs the reference `masksequence` output.

Golden qdb_masked: lowercase letters = masked (tantan posterior >= 0.9 with
blosum62 2.0-bit probabilities, or residues mapping to X).
"""

import pathlib

import numpy as np

from mmseqs2_tpu.data.submat import get_submat
from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.ops.tantan import likelihood_ratio_matrix, mask_batch

GOLDEN = pathlib.Path(__file__).parent / "golden" / "toy"


def test_tantan_mask_parity():
    submat = get_submat("blosum62.out", 2.0, 0.0)
    lr = likelihood_ratio_matrix(submat)
    x_idx = submat.aa2num["X"]
    raw = DBReader(str(GOLDEN / "qdb"))
    gold = DBReader(str(GOLDEN / "qdb_masked"))

    seqs = [submat.encode(raw.get_seq(i)) for i in range(raw.size)]
    masked, total = mask_batch(seqs, lr, x_idx)

    mismatches = 0
    for i in range(raw.size):
        want = np.frombuffer(gold.get_seq(gold.get_id(raw.get_db_key(i))),
                             dtype=np.uint8)
        want_masked = (want >= ord('a'))          # lowercase = masked
        got_masked = masked[i] == x_idx
        if not np.array_equal(want_masked, got_masked):
            mismatches += 1
    assert mismatches == 0, f"{mismatches}/{raw.size} sequences differ"
    assert total > 0   # sanity: toy set does contain low-complexity stretches
