"""Tests for profiling utilities and MPT init schemes."""

import time

import numpy as np

import jax

from tokenpacker_tpu.models.init_fns import INIT_SCHEMES, reinit_kernels
from tokenpacker_tpu.models.mpt import init_mpt, mpt_config
from tokenpacker_tpu.utils.profiling import PhaseStats, annotate


def test_phase_stats_summary():
    stats = PhaseStats()
    with stats.phase("prefill"):
        time.sleep(0.01)
    stats.record("decode", 0.002)
    stats.record("decode", 0.004)
    s = stats.summary()
    assert s["prefill"]["count"] == 1
    assert s["prefill"]["p50_ms"] >= 10
    assert s["decode"]["count"] == 2
    assert 1.5 < s["decode"]["mean_ms"] < 4.5
    stats.reset()
    assert stats.summary() == {}


def test_annotate_context():
    with annotate("test-region"):
        pass


def test_all_init_schemes_produce_finite_kernels():
    cfg = mpt_config(d_model=64, n_heads=4, n_layers=2, vocab_size=128)
    params = init_mpt(jax.random.PRNGKey(0), cfg)
    for scheme in INIT_SCHEMES:
        p = reinit_kernels(jax.random.PRNGKey(1), params, scheme, d_model=64, n_layers=2)
        w = np.asarray(p["layers"]["attn"]["wqkv"]["kernel"])
        assert np.isfinite(w).all() and w.std() > 0, scheme
        # norms untouched
        np.testing.assert_array_equal(
            np.asarray(p["layers"]["norm_1"]["scale"]),
            np.asarray(params["layers"]["norm_1"]["scale"]),
        )
