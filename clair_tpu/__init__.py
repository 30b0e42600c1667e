"""clair_tpu — a TPU-native germline small-variant calling framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of Clair
(reference: /root/reference, HKU-BAL/Clair v2):

- ``clair_tpu.task``      label spaces (GT21 / genotype / variant length)
- ``clair_tpu.models``    the multi-task BiLSTM network as pure-JAX pytrees
- ``clair_tpu.ops``       Pallas TPU kernels + device-side decode helpers
- ``clair_tpu.parallel``  mesh/sharding strategy (dp x mp over ICI)
- ``clair_tpu.io``        BGZF/BAM/FASTA/VCF readers written from scratch
                          (the reference shells out to samtools/pysam; this
                          framework has its own native IO stack)
- ``clair_tpu.data``      pileup candidate extraction + tensor creation +
                          training-bin format
- ``clair_tpu.pipeline``  call_var / call_bam / train / evaluate entry points
- ``clair_tpu.post``      VCF post-processing (overlap filter, ensemble)

Unlike the reference (a pipeline of PyPy processes connected by gzip text
pipes, plus a TF1 session), this framework runs the whole BAM->VCF path in
one process: a vectorized (numpy / native C++) host pileup producer feeding
fixed-shape batches to a jitted TPU forward pass, with host-side VCF decode
overlapped via double buffering.
"""

__version__ = "0.1.0"

from clair_tpu import params  # noqa: F401
