"""Test harness: force an 8-device virtual CPU platform before jax init.

Multi-device sharding tests run against this virtual mesh (the pattern the
reference lacks entirely — its tests never touch its DDP path, SURVEY §4).
"""

import os
import sys

# FORCE cpu: the environment exports JAX_PLATFORMS=axon globally AND its
# sitecustomize pre-imports jax, freezing that env var into jax.config —
# so both the env var and jax.config must be overridden before the first
# backend initialization, or the whole suite silently runs over the
# remote-TPU tunnel (slow, and hangs when another process holds the chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax as _jax  # noqa: E402

_jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This image's CPU backend defaults to reduced-precision matmuls (bf16-like),
# which makes Dense outputs vary with batch shape by ~1e-2 — enough to break
# exact full-vs-cached-decode comparisons.  Pin tests to fp32 matmuls.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")


def cli_subprocess_env() -> dict:
    """Env for spawning CLI subprocesses hermetically on CPU.

    Stripping ``PALLAS_AXON_POOL_IPS`` is load-bearing: the image's
    sitecustomize calls the axon PJRT ``register()`` (a remote-TPU claim)
    in EVERY python process whenever that var is set — even under
    ``JAX_PLATFORMS=cpu`` — and the claim hangs while the parent test
    process holds the chip lease.  See VERDICT r1 "What's weak #1".
    """
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_"))}
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    return env

# Persistent compilation cache — CPU test recompiles dominate suite runtime.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
