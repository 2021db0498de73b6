"""Test configuration: force the CPU backend with 8 virtual devices so unit
and sharding tests run fast and deterministically without TPU hardware.

The container pins ``JAX_PLATFORMS=axon`` (a tunneled single TPU with remote
compilation) and a sitecustomize imports jax at interpreter start, so the env
var is already captured — ``jax.config.update`` is the only override that
works here. XLA_FLAGS must still be set before the CPU client is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolate_cwd(tmp_path, monkeypatch):
    """Run every test from its own temp directory: TrainConfig's default
    log_dir='logs' is relative, and tests that fit() without an explicit
    log_dir were silently overwriting the repo's committed example
    artifact (logs/history.json). No test relies on a repo-relative
    path (reference artifacts are addressed absolutely)."""
    monkeypatch.chdir(tmp_path)
