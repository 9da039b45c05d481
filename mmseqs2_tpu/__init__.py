"""mmseqs2_tpu — a TPU-native many-against-many sequence search & clustering framework.

A from-scratch re-design of the capabilities of MMseqs2 (soedinglab/MMseqs2) for
TPU hardware: the compute cores (k-mer prefilter, ungapped diagonal rescoring,
gapped Smith-Waterman alignment, clustering) run as fixed-shape batched JAX/Pallas
kernels; the host side (database format, CLI, workflows) is Python/C++.

On-disk database format is byte-compatible with the reference (see db/).
"""

__version__ = "0.1.0"
