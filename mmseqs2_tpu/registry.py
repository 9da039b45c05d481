"""Command registry: one table of all commands (reference src/MMseqsBase.cpp).

Each command is a callable `fn(params, command) -> int` registered with its
name, usage string, and positional-argument arity. Commands are loaded lazily
to keep CLI startup fast (JAX import deferred until a compute command runs).
"""

import importlib
from dataclasses import dataclass, field
from typing import Callable, List, Optional

# command categories (mirrors COMMAND_* groups in the reference)
CAT_MAIN = "Easy workflows (for non-experts)"
CAT_WORKFLOW = "Main workflows"
CAT_CORE = "Core modules"
CAT_UTIL = "Utility modules"
CAT_DB = "Database management"
CAT_SPECIAL = "Special-purpose utilities"
CAT_HIDDEN = "hidden"


@dataclass
class Command:
    name: str
    module: str            # python module under mmseqs2_tpu.commands
    func: str              # function name inside the module
    category: str
    description: str
    usage: str
    min_db: int = 0
    max_db: int = 0

    def load(self) -> Callable:
        mod = importlib.import_module(f"mmseqs2_tpu.commands.{self.module}")
        return getattr(mod, self.func)


COMMANDS: List[Command] = [
    # easy workflows
    Command("easy-search", "easy_search", "easy_search", CAT_MAIN,
            "Sensitive homology search (FASTA in, BLAST-tab out)",
            "easy-search <queryFasta> <targetFastaOrDB> <outFile> <tmpDir>", 4, 0),
    Command("easy-cluster", "easy_cluster", "easy_cluster", CAT_MAIN,
            "Cluster sequences by similarity (FASTA in)",
            "easy-cluster <fasta> <outPrefix> <tmpDir>", 3, 0),
    Command("easy-linclust", "easy_cluster", "easy_linclust", CAT_MAIN,
            "Cluster sequences in linear time (FASTA in)",
            "easy-linclust <fasta> <outPrefix> <tmpDir>", 3, 0),
    # main workflows
    Command("search", "search", "search", CAT_WORKFLOW,
            "Sensitive homology search",
            "search <queryDB> <targetDB> <alnDB> <tmpDir>", 4, 4),
    Command("cluster", "cluster_wf", "cluster", CAT_WORKFLOW,
            "Cluster a sequence DB",
            "cluster <seqDB> <clustDB> <tmpDir>", 3, 3),
    Command("linclust", "cluster_wf", "linclust", CAT_WORKFLOW,
            "Cluster a sequence DB in linear time",
            "linclust <seqDB> <clustDB> <tmpDir>", 3, 3),
    # core modules
    Command("prefilter", "prefilter_cmd", "prefilter", CAT_CORE,
            "K-mer inverted-index double-diagonal prefilter",
            "prefilter <queryDB> <targetDB> <prefDB>", 3, 3),
    Command("ungappedprefilter", "prefilter_cmd", "ungappedprefilter", CAT_CORE,
            "Exhaustive ungapped diagonal prefilter",
            "ungappedprefilter <queryDB> <targetDB> <prefDB>", 3, 3),
    Command("gappedprefilter", "prefilter_cmd", "gappedprefilter", CAT_CORE,
            "Exhaustive gapped Smith-Waterman prefilter",
            "gappedprefilter <queryDB> <targetDB> <prefDB>", 3, 3),
    Command("align", "align_cmd", "align", CAT_CORE,
            "Smith-Waterman gapped alignment of prefilter results",
            "align <queryDB> <targetDB> <prefDB> <alnDB>", 4, 4),
    Command("lcaalign", "align_cmd", "lcaalign", CAT_CORE,
            "Approximate 2bLCA alignment for taxonomy assignment",
            "lcaalign <queryDB> <targetDB> <prefDB> <alnDB>", 4, 4),
    Command("rescorediagonal", "rescorediagonal", "rescorediagonal", CAT_CORE,
            "Rescore prefilter hits along their diagonal",
            "rescorediagonal <queryDB> <targetDB> <resultDB> <outDB>", 4, 4),
    Command("clust", "clust_cmd", "clust", CAT_CORE,
            "Cluster result DB by set-cover/connected-component/greedy",
            "clust <seqDB> <resultDB> <clustDB>", 3, 3),
    Command("kmermatcher", "kmermatcher", "kmermatcher", CAT_CORE,
            "Find k-mer sharing candidate pairs in linear time",
            "kmermatcher <seqDB> <prefDB>", 2, 2),
    # db management
    Command("filterdb", "filterdb_cmd", "filterdb", CAT_UTIL,
            "Filter result DB entries by column/file criteria",
            "filterdb <resultDB> <outDB>", 2, 2),
    Command("kmerindexdb", "linsearch", "kmerindexdb", CAT_DB,
            "Persist the k-min-mer table for linsearch",
            "kmerindexdb <seqDB> <indexDB>", 2, 2),
    Command("createlinindex", "linsearch", "createlinindex", CAT_DB,
            "Create the linsearch index (<seqDB>.linidx)",
            "createlinindex <seqDB> [<tmpDir>]", 1, 2),
    Command("kmersearch", "linsearch", "kmersearch", CAT_CORE,
            "Match query k-min-mers against a linsearch index",
            "kmersearch <queryDB> <indexDB> <prefDB>", 3, 3),
    Command("linsearch", "linsearch", "linsearch", CAT_WORKFLOW,
            "Fast, less sensitive linear-time search",
            "linsearch <queryDB> <targetDB> <alnDB> <tmpDir>", 4, 4),
    Command("easy-linsearch", "linsearch", "easy_linsearch", CAT_MAIN,
            "Fast linear-time search (FASTA in, BLAST-tab out)",
            "easy-linsearch <queryFasta> <targetFasta> <outFile> <tmpDir>",
            4, 4),
    Command("map", "map_rbh", "map_workflow", CAT_WORKFLOW,
            "Map nearly identical sequences",
            "map <queryDB> <targetDB> <alnDB> <tmpDir>", 4, 4),
    Command("rbh", "map_rbh", "rbh", CAT_WORKFLOW,
            "Reciprocal best hit search",
            "rbh <aDB> <bDB> <outDB> <tmpDir>", 4, 4),
    Command("easy-rbh", "map_rbh", "easy_rbh", CAT_MAIN,
            "Reciprocal best hit search (FASTA in, BLAST-tab out)",
            "easy-rbh <aFasta> <bFasta> <outFile> <tmpDir>", 4, 4),
    Command("result2rbh", "map_rbh", "result2rbh", CAT_UTIL,
            "Extract reciprocal best hits from a merged best-hit DB",
            "result2rbh <resultDB> <outDB>", 2, 2),
    Command("multihitdb", "multihit_wf", "multihitdb", CAT_WORKFLOW,
            "Build a set DB from nucleotide contig FASTA files",
            "multihitdb <fasta...> <setDB> <tmpDir>", 3, 0),
    Command("multihitsearch", "multihit_wf", "multihitsearch", CAT_WORKFLOW,
            "Search with a set DB against a set DB",
            "multihitsearch <querySetDB> <targetSetDB> <outDB> <tmpDir>",
            4, 4),
    Command("besthitperset", "multihit", "besthitperset", CAT_UTIL,
            "Keep the best hit per target set (log-corrected p-value)",
            "besthitperset <queryDB> <targetDB> <resultDB> <outDB>", 4, 4),
    Command("combinepvalperset", "multihit", "combinepvalperset", CAT_UTIL,
            "Aggregate p-values per query set",
            "combinepvalperset <queryDB> <targetDB> <resultDB> <outDB>",
            4, 4),
    Command("mergeresultsbyset", "multihit", "mergeresultsbyset", CAT_UTIL,
            "Concatenate per-member results into per-set entries",
            "mergeresultsbyset <setDB> <resultDB> <outDB>", 3, 3),
    Command("result2stats", "multihit", "result2stats", CAT_UTIL,
            "Compute per-entry statistics of a result DB",
            "result2stats <queryDB> <targetDB> <resultDB> <statsDB>", 4, 4),
    Command("tsv2db", "multihit", "tsv2db", CAT_DB,
            "Convert a TSV file to a DB",
            "tsv2db <tsvFile> <outDB>", 2, 2),
    Command("expandaln", "expandaln", "expandaln", CAT_UTIL,
            "Expand an alignment result through intermediate cluster "
            "alignments (backtrace composition)",
            "expandaln <queryDB> <targetSeqDB> <alnDB> <clustAlnDB> "
            "<outAlnDB>", 5, 5),
    Command("expand2profile", "expandaln", "expand2profile", CAT_UTIL,
            "Expand an alignment result and build a query profile from it",
            "expand2profile <queryDB> <targetSeqDB> <alnDB> <clustAlnDB> "
            "<profileDB>", 5, 5),
    Command("indexdb", "indexdb_cmd", "indexdb", CAT_DB,
            "Precompute the k-mer index table for a sequence DB",
            "indexdb <seqDB> <indexDbBase>", 2, 2),
    Command("createindex", "indexdb_cmd", "createindex", CAT_WORKFLOW,
            "Precompute the prefilter index (workflow wrapper)",
            "createindex <seqDB> [<tmpDir>]", 1, 2),
    Command("createdb", "createdb", "createdb", CAT_DB,
            "Convert FASTA/Q to a sequence DB",
            "createdb <fasta[.gz|.bz2]> ... <seqDB>", 2, 0),
    Command("convertalis", "convertalis", "convertalis", CAT_UTIL,
            "Convert an alignment DB to BLAST-tab/SAM/HTML",
            "convertalis <queryDB> <targetDB> <alnDB> <outFile>", 4, 4),
    Command("createtsv", "db_tools", "createtsv", CAT_UTIL,
            "Convert a result DB to TSV",
            "createtsv <queryDB> [<targetDB>] <resultDB> <tsvFile>", 3, 4),
    Command("createsubdb", "db_tools", "createsubdb", CAT_DB,
            "Create a subset DB from keys",
            "createsubdb <subsetFileOrDB> <DB> <outDB>", 3, 3),
    Command("mergedbs", "db_tools", "mergedbs", CAT_DB,
            "Merge entries of multiple DBs",
            "mergedbs <DB> <outDB> <DB1> ... <DBn>", 4, 0),
    Command("taxonomy", "tax_tools", "taxonomy", CAT_WORKFLOW,
            "Taxonomic classification",
            "taxonomy <queryDB> <targetDB> <taxDB> <tmpDir>", 4, 4),
    Command("easy-taxonomy", "tax_tools", "easy_taxonomy", CAT_MAIN,
            "Taxonomic classification (FASTA in, reports out)",
            "easy-taxonomy <fasta> <targetDB> <outPrefix> <tmpDir>", 4, 4),
    Command("createtaxdb", "tax_tools", "createtaxdb", CAT_DB,
            "Add taxonomy files to a sequence DB (offline)",
            "createtaxdb <seqDB> <tmpDir>", 2, 2),
    Command("createbintaxmapping", "tax_tools", "createbintaxmapping",
            CAT_DB, "Sort a taxonomy mapping file",
            "createbintaxmapping <mappingFile> <outFile>", 2, 2),
    Command("lca", "tax_tools", "lca", CAT_CORE,
            "Compute the lowest common ancestor per query",
            "lca <targetDB> <resultDB> <taxDB>", 3, 3),
    Command("majoritylca", "tax_tools", "majoritylca", CAT_CORE,
            "Compute the weighted majority LCA per query",
            "majoritylca <targetDB> <resultDB> <taxDB>", 3, 3),
    Command("addtaxonomy", "tax_tools", "addtaxonomy", CAT_UTIL,
            "Append taxonomy columns to result lines",
            "addtaxonomy <targetDB> <resultDB> <outDB>", 3, 3),
    Command("filtertaxdb", "tax_tools", "filtertaxdb", CAT_UTIL,
            "Filter results by a taxon-list expression",
            "filtertaxdb <targetDB> <resultDB> <outDB>", 3, 3),
    Command("taxonomyreport", "tax_tools", "taxonomyreport", CAT_UTIL,
            "Kraken-style taxonomy report",
            "taxonomyreport <targetDB> <resultDB/seqDB> <report>", 3, 3),
    Command("profile2pssm", "msa_tools", "profile2pssm", CAT_UTIL,
            "Render a profile DB as a PSSM table",
            "profile2pssm <profileDB> <pssmFile>", 2, 2),
    Command("profile2consensus", "msa_tools", "profile2consensus", CAT_UTIL,
            "Extract consensus sequences from a profile DB",
            "profile2consensus <profileDB> <seqDB>", 2, 2),
    Command("profile2repseq", "msa_tools", "profile2repseq", CAT_UTIL,
            "Extract representative sequences from a profile DB",
            "profile2repseq <profileDB> <seqDB>", 2, 2),
    Command("result2msa", "msa_tools", "result2msa", CAT_UTIL,
            "Compute MSAs from alignment results",
            "result2msa <queryDB> <targetDB> <resultDB> <msaDB>", 4, 4),
    Command("msa2profile", "msa_tools", "msa2profile", CAT_UTIL,
            "Convert an MSA DB to a profile DB",
            "msa2profile <msaDB> <profileDB>", 2, 2),
    Command("result2flat", "util_tools", "result2flat", CAT_UTIL,
            "Create flat file from a result DB",
            "result2flat <queryDB> <targetDB> <resultDB> <fastaFile>", 4, 4),
    Command("convert2fasta", "util_tools", "convert2fasta", CAT_UTIL,
            "Convert a sequence DB to FASTA",
            "convert2fasta <seqDB> <fastaFile>", 2, 2),
    Command("prefixid", "util_tools", "prefixid", CAT_UTIL,
            "Prepend the entry key to every line",
            "prefixid <DB> <outDB>", 2, 2),
    Command("suffixid", "util_tools", "suffixid", CAT_UTIL,
            "Append the entry key to every line",
            "suffixid <DB> <outDB>", 2, 2),
    Command("reverseseq", "util_tools", "reverseseq", CAT_UTIL,
            "Reverse sequences", "reverseseq <seqDB> <outDB>", 2, 2),
    Command("sortresult", "util_tools", "sortresult", CAT_UTIL,
            "Sort result entries by E-value/score",
            "sortresult <resultDB> <outDB>", 2, 2),
    Command("summarizeresult", "util_tools", "summarizeresult", CAT_UTIL,
            "Greedy non-overlapping domain selection",
            "summarizeresult <alnDB> <outDB>", 2, 2),
    Command("splitdb", "util_tools", "splitdb", CAT_DB,
            "Split a DB into chunks", "splitdb <DB> <outDB>", 2, 2),
    Command("renamedbkeys", "util_tools", "renamedbkeys", CAT_DB,
            "Rename DB keys from a mapping file",
            "renamedbkeys <mappingFile> <DB> <outDB>", 3, 3),
    Command("masksequence", "util_tools", "masksequence", CAT_UTIL,
            "Soft-mask low-complexity regions",
            "masksequence <seqDB> <outDB>", 2, 2),
    Command("orftocontig", "util_tools", "orftocontig", CAT_UTIL,
            "Write ORF-to-contig coordinates as alignments",
            "orftocontig <contigsDB> <orfsDB> <alnDB>", 3, 3),
    Command("aliasdb", "util_tools", "aliasdb", CAT_DB,
            "Symlink a DB under a new name", "aliasdb <DB> <aliasDB>", 2, 2),
    Command("swapdb", "util_tools", "swapdb", CAT_UTIL,
            "Transpose a result DB (query <-> target keys)",
            "swapdb <resultDB> <outDB>", 2, 2),
    Command("extractorfs", "nucl_tools", "extractorfs", CAT_UTIL,
            "Extract (and translate) open reading frames",
            "extractorfs <nuclDB> <outDB>", 2, 2),
    Command("translatenucs", "nucl_tools", "translatenucs", CAT_UTIL,
            "Translate a nucleotide DB to amino acids",
            "translatenucs <nuclDB> <aaDB>", 2, 2),
    Command("extractframes", "nucl_tools", "extractframes", CAT_UTIL,
            "Extract frames from a nucleotide sequence DB",
            "extractframes <seqDB> <outSeqDB>", 2, 2),
    Command("splitsequence", "nucl_tools", "splitsequence", CAT_UTIL,
            "Split long sequences into overlapping chunks",
            "splitsequence <seqDB> <outSeqDB>", 2, 2),
    Command("offsetalignment", "nucl_tools", "offsetalignment", CAT_UTIL,
            "Map ORF/frame alignments back to contig coordinates",
            "offsetalignment <qSrcDB> <qOrfDB> <tSrcDB> <tOrfDB> <alnDB> "
            "<outDB>", 6, 6),
    Command("subtractdbs", "db_tools", "subtractdbs", CAT_DB,
            "Remove all entries of a result DB found in another result DB",
            "subtractdbs <resultDBLeft> <resultDBRight> <outDB>", 3, 3),
    Command("concatdbs", "db_tools", "concatdbs", CAT_DB,
            "Concatenate two DBs",
            "concatdbs <DB1> <DB2> <outDB>", 3, 3),
    Command("rmdb", "db_tools", "rmdb", CAT_DB,
            "Remove a DB", "rmdb <DB>", 1, 1),
    Command("mvdb", "db_tools", "mvdb", CAT_DB,
            "Move a DB", "mvdb <srcDB> <dstDB>", 2, 2),
    Command("cpdb", "db_tools", "cpdb", CAT_DB,
            "Copy a DB", "cpdb <srcDB> <dstDB>", 2, 2),
    Command("lndb", "db_tools", "lndb", CAT_DB,
            "Symlink a DB", "lndb <srcDB> <dstDB>", 2, 2),
    Command("touchdb", "db_tools", "touchdb", CAT_DB,
            "Preload a DB into memory", "touchdb <DB>", 1, 1),
    Command("view", "db_tools", "view", CAT_UTIL,
            "Print DB entries", "view <DB> [<key> ...]", 1, 0),
    Command("dbtype", "db_tools", "dbtype_cmd", CAT_DB,
            "Print the DB type", "dbtype <DB>", 1, 1),
    Command("summarizealis", "util_tools", "summarizealis", CAT_UTIL,
            "Summarize alignment result to one row (uniq. cov., cov., avg. seq. id.)",
            "summarizealis <alignmentDB> <outDB>", 2, 2),
    Command("swapresults", "db_tools", "swapresults", CAT_UTIL,
            "Transpose a result DB (query<->target)",
            "swapresults <queryDB> <targetDB> <resultDB> <outDB>", 4, 4),
    Command("mergeclusters", "cluster_tools", "mergeclusters", CAT_UTIL,
            "Merge cascaded clustering steps",
            "mergeclusters <seqDB> <outDB> <clustDB1> ... <clustDBn>", 4, 0),
    Command("result2repseq", "cluster_tools", "result2repseq", CAT_UTIL,
            "Extract representative sequences from clustering",
            "result2repseq <seqDB> <clustDB> <outDB>", 3, 3),
    Command("createseqfiledb", "cluster_tools", "createseqfiledb", CAT_UTIL,
            "Create a DB of unaligned FASTA files from clusters",
            "createseqfiledb <seqDB> <clustDB> <outDB>", 3, 3),
    Command("result2profile", "result2profile", "result2profile", CAT_CORE,
            "Compute a PSSM profile DB from alignment results",
            "result2profile <queryDB> <targetDB> <alnDB> <profileDB>", 4, 4),
    Command("version", "misc", "version", CAT_UTIL, "Show version",
            "version", 0, 0),
]

_BY_NAME = {c.name: c for c in COMMANDS}


def get_command(name: str) -> Optional[Command]:
    return _BY_NAME.get(name)


def suggest(name: str) -> Optional[str]:
    """Levenshtein 'did you mean' (reference src/commons/Application.cpp:208)."""
    def dist(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    best, best_d = None, 1 << 30
    for c in COMMANDS:
        d = dist(name, c.name)
        if d < best_d:
            best, best_d = c.name, d
    return best if best_d <= max(2, len(name) // 3) else None
