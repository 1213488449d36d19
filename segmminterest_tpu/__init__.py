"""segmminterest_tpu — a TPU-native (JAX/XLA/pjit/Pallas) framework with the
capabilities of hezy18/SegMMInterest (SIGIR 2025).

Layers (bottom-up):
  core/     mesh + sharding setup, dtype policy, masked numerics (survival
            transform, masked softmax), fused attention kernels.
  data/     label codec, readers, fixed-shape batch assemblers, feature store.
  models/   SegFormerX encoder, interest decoder + loss zoo, SegRec backbones.
  engine/   jitted train/eval steps, checkpointing, metrics, early stopping.
  tasks/    CLI entry points mirroring the reference drivers.

The reference (mounted at /root/reference, PyTorch) is a behavioral spec only;
everything here is designed TPU-first: fixed shapes, mask-aware batches, jit'd
compute, batch sharding over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
