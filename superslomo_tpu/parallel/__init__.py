"""Scale-out (SPMD) layer: device meshes and sharded train/eval steps.

The reference's only parallelism is single-process torch DataParallel
(scripts/main.py:74-76) — replica-per-GPU scatter/gather each step. Here the
equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis (batch-sharded
inputs, replicated params; XLA emits the gradient all-reduce over ICI), plus
an optional ``spatial`` axis that shards the image-height dimension across
chips for frames too large for one chip's HBM — XLA inserts the conv halo
exchanges automatically.
"""

from superslomo_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
