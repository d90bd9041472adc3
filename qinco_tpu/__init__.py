"""qinco-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for QINCo / QINCo2
neural residual vector quantization.

Built from scratch with the capabilities of facebookresearch/Qinco
(reference mounted at /root/reference), redesigned TPU-first:

- a single pure-functional model core (parameter pytrees + jitted
  ``encode`` / ``decode`` / ``train_step``) instead of the reference's
  three torch module families (qinco/model/qinco_base.py,
  qinco/model/qinco_inference.py),
- static-shape beam search expressed as ``lax.scan`` over stacked
  per-step parameters,
- data-parallel + codebook-sharded execution over a ``jax.sharding.Mesh``
  instead of torch DDP/NCCL,
- a C++ IVF index (native/) replacing the faiss dependency.
"""

__version__ = "0.1.0"
