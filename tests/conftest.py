"""Test configuration: CPU simulation of an 8-device mesh + float64.

Tier (a) of the distributed test strategy (SURVEY.md §4): the same shard_map
code runs on 8 virtual CPU devices here, on real chips in production.

Environment quirk: this machine's sitecustomize pins JAX_PLATFORMS=axon (the
TPU tunnel), and re-setting the env var before import is ignored.  The
working override is ``jax.config.update('jax_platforms', 'cpu')`` *after*
import (XLA_FLAGS must still be set before import for the 8 virtual
devices).  Running tests on the axon TPU would be slow (20–40 s compiles) and
f64 would be emulated (~1e-14 roundoff), so CPU is both faster and stricter.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: XLA:CPU compiles the deep EFT graphs in
# O(minutes) on this 2-core host; repeat suite runs hit the cache
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_poms_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
