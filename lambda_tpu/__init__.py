"""lambda_tpu: a TPU-native BLAST-compatible local sequence aligner.

A from-scratch reimplementation of the capabilities of seqan/lambda
("the Local Aligner for Massive Biological DatA") designed for TPUs:

* seeding via a TPU-resident sorted k-mer/suffix-prefix index instead of an
  FM-index (batched device binary search replaces pointer-chasing
  backward search),
* seed filtering and banded Smith-Waterman extension as JAX/XLA/Pallas
  device kernels (anti-diagonal wavefront DP on the VPU, substitution
  scores via MXU one-hot matmuls),
* Karlin-Altschul statistics, BLAST m0/m8/m9 + SAM/BAM output on host,
* scale-out by sharding the database over a ``jax.sharding.Mesh``.

Subcommands mirror the reference CLI: searchp/searchn/searchbs and
mkindexp/mkindexn/mkindexbs.
"""

__version__ = "0.1.0"

# program tag written into output headers (reference writes
# "lambda3-<version>"; we write our own tag)
PROGRAM_NAME = "lambda-tpu"
