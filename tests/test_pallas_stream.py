"""HBM-streaming likelihood path of the fused Pallas engine.

For data-heavy likelihoods the fused kernel cannot replicate the data into
VMEM (the reference has no analogous constraint — its SIMD kernels read
from host RAM, nuts-rs ``src/math/cpu_math.rs``); instead the data stays in
HBM and every evaluation DMAs row tiles through double-buffered VMEM
scratch (``models.model.StreamSpec``, ``kernels/nuts_pallas.py`` stream
mode).  These tests pin:

* StreamSpec contract validation,
* BIT-IDENTICAL draws vs the dense VMEM path when the whole dataset is one
  tile (same float ops, same hash-PRNG stream — tests exactly the DMA
  plumbing and argument threading),
* multi-tile likelihood correctness along real trajectories (emitted logp
  stat vs the model's XLA log-density at the emitted positions),
* the public-API gating: a stream-only model samples through the Sampler
  with the Pallas posterior kernel and matches the XLA kernel's posterior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuts_rs_tpu.kernels.nuts import NutsOptions
from nuts_rs_tpu.kernels.nuts_pallas import nuts_pallas_run
from nuts_rs_tpu.models.model import Model, StreamSpec


def _logreg_pieces(n_data, dim, seed, tile_rows):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n_data, dim)).astype(np.float32) / np.sqrt(dim)
    w_true = rng.normal(size=dim).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-(x @ w_true)))
    y = (rng.uniform(size=n_data) < p).astype(np.float32)
    n_pad = (-n_data) % tile_rows
    x_p = np.concatenate([x, np.zeros((n_pad, dim), np.float32)], axis=0)
    y_p = np.concatenate([y, np.zeros(n_pad, np.float32)])[:, None]
    w_p = np.concatenate([np.ones(n_data, np.float32),
                          np.zeros(n_pad, np.float32)])[:, None]

    def tile_eval(q, xt, yt, wt):
        logits = jnp.dot(xt, q, preferred_element_type=jnp.float32)
        ll = jnp.sum(wt * (yt * logits - jnp.logaddexp(0.0, logits)),
                     axis=0, keepdims=True)
        r = wt * (yt - 1.0 / (1.0 + jnp.exp(-logits)))
        grad = jax.lax.dot_general(
            xt, r, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return ll, grad

    def finalize(q, lp_acc, g_acc):
        return (lp_acc[0] - 0.5 * jnp.sum(q * q, axis=0), g_acc - q)

    def logp(q):
        xx = jnp.asarray(x, q.dtype)
        yy = jnp.asarray(y, q.dtype)
        logits = xx @ q
        ll = jnp.sum(yy * logits - jnp.logaddexp(0.0, logits))
        return ll - 0.5 * jnp.sum(q * q)

    spec = StreamSpec(args=(x_p, y_p, w_p), tile_rows=tile_rows,
                      tile_eval=tile_eval, finalize=finalize)
    return spec, tile_eval, finalize, logp


def test_stream_spec_validation():
    ok = np.zeros((32, 4), np.float32)
    StreamSpec(args=(ok,), tile_rows=8,
               tile_eval=lambda q, t: (q, q), finalize=lambda q, a, b: (a, b))
    with pytest.raises(ValueError, match="multiple"):
        StreamSpec(args=(np.zeros((30, 4), np.float32),), tile_rows=8,
                   tile_eval=None, finalize=None)
    with pytest.raises(ValueError, match="row axis"):
        StreamSpec(args=(ok, np.zeros((16, 1), np.float32)), tile_rows=8,
                   tile_eval=None, finalize=None)


def _run(spec_or_dense, n_data, dim, tile_rows, num_draws=25, seed=7,
         chains=8):
    spec, tile_eval, finalize, logp = _logreg_pieces(
        n_data, dim, seed=3, tile_rows=tile_rows)
    rng = np.random.default_rng(seed)
    C = chains
    q0 = jnp.asarray(rng.normal(size=(C, dim)) * 0.1, jnp.float32)
    lp0, g0 = jax.vmap(jax.value_and_grad(logp))(q0)
    ones = jnp.ones((C, dim), jnp.float32)
    zeros = jnp.zeros((C, dim), jnp.float32)
    opts = NutsOptions(maxdepth=6)

    if spec_or_dense == "stream":
        kwargs = dict(stream=spec, model_args=(),
                      logp_grad_batched=None)
    else:
        # dense baseline defined THROUGH the same tile_eval/finalize over
        # the whole padded dataset as one "tile": identical float ops.
        def dense(q, xt, yt, wt):
            lp_p, g_p = tile_eval(q, xt, yt, wt)
            return finalize(q, lp_p + jnp.zeros_like(lp_p),
                            g_p + jnp.zeros_like(g_p))

        kwargs = dict(model_args=tuple(jnp.asarray(a) for a in spec.args),
                      logp_grad_batched=dense)

    return nuts_pallas_run(
        11, q0, g0, lp0, ones, zeros, jnp.zeros((C,), jnp.float32),
        jnp.full((C,), 0.22, jnp.float32), jnp.full((C,), 0.22, jnp.float32),
        num_draws, opts=opts, jitter=None, block=C, interpret=True,
        **kwargs), logp


def test_stream_single_tile_bit_identical():
    # whole dataset = one tile: identical float ops, identical PRNG stream
    # => identical trajectories, draws and stats, bit for bit.
    n, d, tile = 24, 4, 24
    (qs, gs, lps, draws_s, stats_s), _ = _run("stream", n, d, tile)
    (qd, gd, lpd, draws_d, stats_d), _ = _run("dense", n, d, tile)
    np.testing.assert_array_equal(np.asarray(draws_s), np.asarray(draws_d))
    np.testing.assert_array_equal(np.asarray(qs), np.asarray(qd))
    np.testing.assert_array_equal(np.asarray(lps), np.asarray(lpd))
    for key in stats_s:
        np.testing.assert_array_equal(
            np.asarray(stats_s[key]), np.asarray(stats_d[key]), err_msg=key)


def test_stream_multi_tile_logp_correct_along_trajectory():
    # 5 tiles incl. a zero-weight padded tail: the emitted logp stat must
    # equal the XLA log-density at the emitted positions (f32 tolerance).
    n, d, tile = 36, 4, 8
    (qf, gf, lpf, draws, stats), logp = _run("stream", n, d, tile,
                                             num_draws=12)
    pos = np.asarray(draws)                       # [C, K, d]
    lp_expect = jax.vmap(jax.vmap(logp))(jnp.asarray(pos, jnp.float32))
    np.testing.assert_allclose(np.asarray(stats["logp"]),
                               np.asarray(lp_expect), rtol=2e-4, atol=2e-4)
    lp_f = jax.vmap(logp)(jnp.asarray(np.asarray(qf), jnp.float32))
    np.testing.assert_allclose(np.asarray(lpf), np.asarray(lp_f),
                               rtol=2e-4, atol=2e-4)


def test_stream_only_model_public_api():
    # A model that ONLY provides pallas_stream (no dense channel) samples
    # through the public Sampler with the Pallas posterior kernel (warmup
    # falls back to XLA) and matches the XLA kernel's posterior.
    from nuts_rs_tpu import sample
    from nuts_rs_tpu.sampler import DiagNutsSettings

    spec, _, _, logp = _logreg_pieces(60, 5, seed=9, tile_rows=16)
    model = Model(logp_fn=logp, dim=5, name="logreg_stream",
                  pallas_stream=spec)
    base = dict(num_tune=150, num_draws=250, num_chains=8)
    tr_p = sample(model, DiagNutsSettings(posterior_kernel="pallas", seed=5,
                                          **base), chunk_size=400)
    tr_s = sample(model, DiagNutsSettings(posterior_kernel="sync", seed=6,
                                          **base), chunk_size=400)
    mp = tr_p.posterior["position"].mean(axis=(0, 1))
    ms = tr_s.posterior["position"].mean(axis=(0, 1))
    assert not tr_p.sample_stats["diverging"].any()
    np.testing.assert_allclose(mp, ms, atol=0.25)


def test_packed_stream_model_matches_xla_logp():
    """The shipped logistic_regression StreamSpec packs (x, y, w) into one
    128-lane-aligned array (Mosaic DMA alignment; models/gaussian.py).  Its
    tile_eval must reproduce the model's XLA log-density and gradient."""
    from nuts_rs_tpu.models import gaussian

    model = gaussian.logistic_regression(n_data=64, dim=5, seed=2)
    spec = model.pallas_stream
    assert len(spec.args) == 1
    assert spec.args[0].shape[1] % 128 == 0

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(5, 8)) * 0.3, jnp.float32)  # [d, B]
    n_tiles = spec.args[0].shape[0] // spec.tile_rows
    lp_acc = jnp.zeros((1, 8), jnp.float32)
    g_acc = jnp.zeros((5, 8), jnp.float32)
    for t in range(n_tiles):
        tile = jnp.asarray(
            spec.args[0][t * spec.tile_rows:(t + 1) * spec.tile_rows])
        lp_p, g_p = spec.tile_eval(q, tile)
        lp_acc, g_acc = lp_acc + lp_p, g_acc + g_p
    lp, grad = spec.finalize(q, lp_acc, g_acc)

    lp_ref, g_ref = jax.vmap(
        jax.value_and_grad(model.logp_fn))(jnp.asarray(q.T, jnp.float32))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref.T),
                               rtol=2e-4, atol=2e-4)


def test_unaligned_stream_args_warn():
    with pytest.warns(UserWarning, match="128-lane aligned"):
        StreamSpec(args=(np.zeros((32, 4), np.float32),), tile_rows=8,
                   tile_eval=lambda q, t: (q, q),
                   finalize=lambda q, a, b: (a, b))
