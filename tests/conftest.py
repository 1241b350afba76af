"""Test configuration: hermetic CPU runs with a virtual 8-device mesh.

The reference's tests require CUDA and are unasserted `__main__` scripts
(`INSTALL.md:5-12` in the reference).  Here every test runs on CPU with
`xla_force_host_platform_device_count=8`, so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md section 4 item (e)).

NB: the environment may import jax at interpreter startup (sitecustomize)
with a TPU platform pre-selected, so plain ``os.environ`` writes here would be
ignored; ``jax.config.update`` works as long as no backend has been
initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the unrolled search graphs are compile-heavy
# on CPU; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/qtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
