import os
import sys

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# compile and execute without TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The environment's sitecustomize imports jax at interpreter start (before
# this conftest), capturing JAX_PLATFORMS=axon into jax.config — override it
# through the config API so tests always run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the generator graphs take ~minutes to build
# on CPU; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/sherf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference/sherf"


def add_reference_path():
    """Put the (read-only) reference implementation on sys.path so tests can
    use its pure-CPU code paths as numerical oracles."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
