"""setup_backend env handling (utils/runtime.py)."""

import os

import jax
import pytest

from semi_supervised_vos_tpu.utils.runtime import setup_backend


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("SVOS_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    # jax_compilation_cache_dir is process-global: restore it so these tests
    # neither order-couple nor leave the session writing cache entries into
    # the real home directory
    before = jax.config.jax_compilation_cache_dir
    yield monkeypatch
    jax.config.update("jax_compilation_cache_dir", before)


def test_default_cache_dir(clean_env):
    setup_backend(None)
    assert jax.config.jax_compilation_cache_dir.endswith("svos_jax_cache")


def test_explicit_cache_path(clean_env, tmp_path):
    clean_env.setenv("SVOS_COMPILE_CACHE", str(tmp_path / "cc"))
    setup_backend(None)
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")


@pytest.mark.parametrize("off", ["off", "0", "none", "OFF"])
def test_cache_opt_out(clean_env, off):
    jax.config.update("jax_compilation_cache_dir", None)
    clean_env.setenv("SVOS_COMPILE_CACHE", off)
    setup_backend(None)
    assert jax.config.jax_compilation_cache_dir is None


def test_respects_jax_native_env(clean_env, tmp_path):
    jax.config.update("jax_compilation_cache_dir", None)
    clean_env.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "native"))
    setup_backend(None)
    # setup_backend must not override an explicit JAX-native location
    assert jax.config.jax_compilation_cache_dir is None


def test_cpu_device_selection(clean_env):
    # conftest already forces CPU; device="cpu" must be a no-op re-assert
    setup_backend("cpu")
    assert jax.default_backend() == "cpu"
