"""nersemble_tpu: TPU-native (JAX/XLA/Pallas/pjit) dynamic radiance-field framework.

A from-scratch rebuild of the capabilities of NeRSemble (SIGGRAPH 2023,
reference: tobias-kirschstein/nersemble) designed for TPU hardware:

- Multi-resolution hash-grid *ensemble* with time-blended latent weighting
  (reference: src/nersemble/nerfstudio/field_components/hash_ensemble.py).
- SE(3) deformation field warping deformed-space samples into a canonical space
  (reference: src/nersemble/nerfstudio/field_components/deformation_field.py).
- Instant-NGP-style occupancy-grid ray marching, alpha compositing, and the
  efficient distortion loss as XLA-compiled fixed-shape masked-tensor ops
  (reference: nerfacc CUDA kernels).
- Scheduled coarse-to-fine windows for deformation frequencies and hash tables.
- Head-capture supervision: masked RGB, alpha, depth-based near/empty, depth,
  and distortion losses (reference: src/nersemble/nerfstudio/models/base.py).

Parallelism: data parallelism over rays via jax.sharding over a device Mesh
(ICI collectives inserted by XLA), with optional hash-table sharding.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some out-of-tree TPU plugins (e.g. the axon tunnel on this host) probe
    # their backend even when JAX_PLATFORMS excludes them — and hang for
    # minutes when the device link is down. jax.config IS honored before
    # backend init, so mirror the env var there. No-op once backends exist.
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # already initialized or jax absent — keep defaults
        pass
