"""Training / table-generation subsystem.

TPU-native re-implementation of the reference's offline training and
codegen tools (reference: tools/gen_laplace_tables.c, tools/gen_cdf.c,
tools/compute_basis.c, tools/cos_search.c, tools/vq_train.c,
tools/trans_gain.c, tools/gen_zigzag*.m).  Where the reference ships
C/Matlab search programs, these modules provide the same *search
capability* as vectorized numpy/jax code: the shipped normative tables
in `daala_tpu.ops._tables` are regenerable from first principles
(tests/test_train.py proves bit-for-bit or near-float equality), and
the searches (cosine-constant, VQ codebook, lapped-filter coding gain)
run as batched array programs that map onto the TPU MXU.
"""
