"""`databases` — catalog of prebuilt reference databases.

Reference: src/workflow/Databases.cpp (catalog, listing format) +
data/workflow/databases.sh (download + post-processing).

This environment has no network egress, so the download step is replaced
by a local mirror: set MMSEQS_DB_MIRROR (or --db-mirror) to a directory
holding the already-fetched artifacts (FASTA/.fasta.gz files, optional
NCBI taxdump under <mirror>/<name>/taxonomy). The post-processing —
createdb (+ createtaxdb when the catalog marks taxonomy) — is identical
to the reference script's fasta_gz path.
"""

import glob
import os

from ..db import dbtype as dbt
from ..utils import log

# name, dbtype, taxonomy, url, description
CATALOG = [
    ("UniRef100", "Aminoacid", True, "https://www.uniprot.org/help/uniref",
     "UniProt Reference Clusters (100% identity)."),
    ("UniRef90", "Aminoacid", True, "https://www.uniprot.org/help/uniref",
     "UniProt Reference Clusters (90% identity)."),
    ("UniRef50", "Aminoacid", True, "https://www.uniprot.org/help/uniref",
     "UniProt Reference Clusters (50% identity)."),
    ("UniProtKB", "Aminoacid", True, "https://www.uniprot.org/help/uniprotkb",
     "UniProt Knowledgebase."),
    ("UniProtKB/TrEMBL", "Aminoacid", True,
     "https://www.uniprot.org/help/uniprotkb",
     "UniProtKB unreviewed (TrEMBL)."),
    ("UniProtKB/Swiss-Prot", "Aminoacid", True, "https://uniprot.org",
     "UniProtKB reviewed (Swiss-Prot)."),
    ("NR", "Aminoacid", True, "https://ftp.ncbi.nlm.nih.gov/blast/db",
     "Non-redundant protein sequences."),
    ("ClusteredNR", "Aminoacid", True,
     "https://ftp.ncbi.nlm.nih.gov/blast/db/experimental",
     "NR clustered at 90% identity/length."),
    ("NT", "Nucleotide", False, "https://ftp.ncbi.nlm.nih.gov/blast/db",
     "Partially non-redundant nucleotide sequences."),
    ("core_nt", "Nucleotide", False,
     "https://ftp.ncbi.nlm.nih.gov/blast/db",
     "Core nucleotide BLAST database."),
    ("GTDB", "Aminoacid", True, "https://gtdb.ecogenomic.org",
     "Genome Taxonomy Database."),
    ("PDB", "Aminoacid", False, "https://www.rcsb.org",
     "Protein Data Bank."),
    ("PDB70", "Profile", False, "https://github.com/soedinglab/hh-suite",
     "PDB clustered to 70% identity, HHblits-enriched."),
    ("Pfam-A.full", "Profile", False, "https://pfam.xfam.org",
     "Pfam protein families (full alignments)."),
    ("Pfam-A.seed", "Profile", False, "https://pfam.xfam.org",
     "Pfam protein families (seed alignments)."),
    ("Pfam-B", "Profile", False,
     "https://xfam.wordpress.com/2020/06/30/a-new-pfam-b-is-released",
     "Automatically generated Pfam supplement."),
    ("CDD", "Profile", False,
     "https://www.ncbi.nlm.nih.gov/Structure/cdd/cdd.shtml",
     "Conserved Domain Database."),
    ("eggNOG", "Profile", False, "http://eggnog5.embl.de",
     "Orthology resource."),
    ("VOGDB", "Profile", False, "https://vogdb.org",
     "Virus Orthologous Groups."),
    ("dbCAN2", "Profile", False, "http://bcb.unl.edu/dbCAN2",
     "Carbohydrate-active enzymes."),
    ("SILVA", "Nucleotide", True, "https://www.arb-silva.de",
     "Ribosomal RNA sequences."),
    ("RNAcentral", "Nucleotide", False, "https://rnacentral.org",
     "Non-coding RNA sequences."),
    ("Resfinder", "Nucleotide", False,
     "https://cge.cbs.dtu.dk/services/ResFinder",
     "Antimicrobial resistance genes."),
    ("Kalamari", "Nucleotide", True, "https://github.com/lskatz/Kalamari",
     "Foodborne-disease surveillance genomes."),
]


def _pad(v, n):
    return v + " " * max(0, n - len(v))


def list_catalog() -> str:
    name_w = max(4, max(len(d[0]) for d in CATALOG)) + 2
    type_w = max(4, max(len(d[1]) for d in CATALOG)) + 2
    url_w = max(3, max(len(d[3]) for d in CATALOG)) + 2
    out = ["  " + _pad("Name", name_w) + _pad("Type", type_w)
           + _pad("Taxonomy", 10) + _pad("Url", url_w)]
    for name, typ, tax, url, _ in CATALOG:
        out.append("- " + _pad(name, name_w) + _pad(typ, type_w)
                   + _pad("yes" if tax else "-", 10) + url)
    return "\n".join(out)


def databases(par, command):
    if len(par.filenames) < 3:
        print(list_catalog())
        return 0
    name, out_db, tmp = par.filenames[:3]
    entry = next((d for d in CATALOG if d[0] == name), None)
    if entry is None:
        log.die(f"Selected database {name} was not found\n\n"
                + list_catalog())
    _, typ, has_tax, url, _ = entry
    mirror = par.db_mirror or os.environ.get("MMSEQS_DB_MIRROR", "")
    if not mirror:
        log.die(
            f"This environment has no network egress; place the {name} "
            f"source files (from {url}) in a mirror directory and pass "
            f"--db-mirror <dir> (or set MMSEQS_DB_MIRROR)")
    sub = os.path.join(mirror, name.replace("/", "_"))
    candidates = []
    for pat in ("*.fasta", "*.fasta.gz", "*.fa", "*.fa.gz", "*.fsa",
                "*.fsa.gz"):
        candidates.extend(sorted(glob.glob(os.path.join(sub, pat))))
        candidates.extend(sorted(glob.glob(os.path.join(mirror, name + pat[1:]))))
    if not candidates:
        log.die(f"No FASTA artifacts for {name} under {sub}")
    os.makedirs(tmp, exist_ok=True)
    from ..registry import get_command
    from ..params import Params

    def run(cname, args):
        c = get_command(cname)
        p = Params().parse([str(a) for a in args], c, c.min_db, c.max_db)
        for attr in par._was_set:
            if attr not in p._was_set and attr != "db_mirror":
                p.set(attr, getattr(par, attr))
        ret = c.load()(p, c)
        if ret not in (0, None):
            raise RuntimeError(f"{cname} failed with {ret}")

    run("createdb", candidates + [out_db])
    if has_tax:
        taxdir = os.path.join(sub, "taxonomy")
        mapping = os.path.join(sub, "mapping")
        if os.path.isdir(taxdir):
            args = [out_db, os.path.join(tmp, "taxdb"),
                    "--ncbi-tax-dump", taxdir]
            if os.path.exists(mapping):
                args += ["--tax-mapping-file", mapping]
            run("createtaxdb", args)
        else:
            log.warning(f"{name} is a taxonomy database but no taxonomy/ "
                        f"dump found under {sub}; skipping createtaxdb")
    return 0
