"""Test configuration: run everything on CPU with 8 virtual devices so that
multi-device sharding tests work without TPU hardware (SURVEY.md §4)."""

import os

# Must run before jax initializes its backends. NOTE: the axon TPU plugin in
# this image ignores JAX_PLATFORMS; JAX_PLATFORM_NAME does force CPU.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize imports jax at interpreter startup and pins
# JAX_PLATFORMS=axon, so env vars alone don't stick — override the config.
jax.config.update("jax_platforms", "cpu")
# fp32 numerical parity with the torch reference (TPU default matmul is bf16).
jax.config.update("jax_default_matmul_precision", "highest")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO))


def reference_available() -> bool:
    return REFERENCE.exists()


def _stub_missing_reference_deps():
    """The reference modules import training-infra packages not present in
    this image (ema_pytorch, tensorboardX); stub them so the numerical
    oracles (GaussianDiffusion math, nets) remain importable."""
    import importlib
    import types

    for name, attrs in {
        "ema_pytorch": {"EMA": type("EMA", (), {})},
        "tensorboardX": {"SummaryWriter": type("SummaryWriter", (), {})},
        "torch_geometric": {},
        "torch_geometric.data": {
            "Dataset": type("Dataset", (), {}),
            "Data": type("Data", (), {}),
        },
        "deepsnap": {},
        "deepsnap.batch": {"Batch": type("Batch", (), {})},
    }.items():
        try:
            importlib.import_module(name)
        except ImportError:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod


@pytest.fixture(scope="session")
def reference_path():
    if not reference_available():
        pytest.skip("reference repo not mounted")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    _stub_missing_reference_deps()
    return REFERENCE
