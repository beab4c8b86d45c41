"""DiffPhyCon-TPU: a TPU-native (JAX/XLA/Pallas) framework for generative control
of physical systems.

Re-implements the capabilities of AI4Science-WestlakeU/diffphycon (NeurIPS 2024)
from scratch with a TPU-first design:

- ``physics``   — differentiable physics solvers (Burgers FD, incompressible NS)
                  as jittable ``lax.scan`` programs with Pallas stencil kernels.
- ``nets``      — Flax neural nets (UNet2D, UNet3D, ForceUNet, surrogates),
                  channels-last, bf16-capable.
- ``diffusion`` — a single unified Gaussian diffusion core (schedules, losses,
                  DDPM/DDIM samplers as scans, prior reweighting, guidance).
- ``training``  — optax/orbax training harness with ``jax.sharding`` data
                  parallelism over a device mesh.
- ``control``   — guidance objectives, J/w schedulers and control metrics.
- ``parallel``  — mesh / sharding utilities.
"""

__version__ = "0.1.0"

# NOTE on compilation caching: jax's persistent compilation cache is a no-op
# under the axon TPU plugin in this image (compilation happens server-side via
# remote_compile, bypassing the client-side cache), so it is intentionally not
# enabled here. Structure long-running work so each process compiles each
# program once (batch CLIs, jit with params as arguments).
