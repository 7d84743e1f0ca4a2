"""Pallas line-integral gather kernel vs direct numpy indexing."""
import jax.numpy as jnp
import numpy as np

from hyperpose_tpu.ops.pallas.line_gather import fused_line_gather


def test_line_gather_matches_numpy(rng):
    b, l, h, w, m = 2, 3, 12, 16, 128
    paf = rng.standard_normal((b, l, 2, h, w)).astype(np.float32)
    ly = rng.integers(0, h, (b, l, m)).astype(np.int32)
    lx = rng.integers(0, w, (b, l, m)).astype(np.int32)
    out = np.asarray(fused_line_gather(
        jnp.asarray(paf), jnp.asarray(ly), jnp.asarray(lx),
        bf16=False, interpret=True,
    ))
    ref = paf[
        np.arange(b)[:, None, None, None],
        np.arange(l)[None, :, None, None],
        np.arange(2)[None, None, :, None],
        ly[:, :, None, :], lx[:, :, None, :],
    ]
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_line_gather_bf16_rounds_values(rng):
    b, l, h, w, m = 1, 2, 8, 8, 64
    paf = rng.standard_normal((b, l, 2, h, w)).astype(np.float32)
    ly = rng.integers(0, h, (b, l, m)).astype(np.int32)
    lx = rng.integers(0, w, (b, l, m)).astype(np.int32)
    out = np.asarray(fused_line_gather(
        jnp.asarray(paf), jnp.asarray(ly), jnp.asarray(lx),
        bf16=True, interpret=True,
    ))
    ref = paf[
        np.arange(b)[:, None, None, None],
        np.arange(l)[None, :, None, None],
        np.arange(2)[None, None, :, None],
        ly[:, :, None, :], lx[:, :, None, :],
    ].astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_decode_pallas_gather_matches_xla(rng):
    """Full decode parity: pallas gather backend (interpreted) vs XLA."""
    import hyperpose_tpu.ops.paf_decode as D
    from tests.test_paf_decode import TWO_PEOPLE, make_synthetic_maps

    conf, paf = make_synthetic_maps(TWO_PEOPLE)
    base = dict(max_peaks=8, max_candidates=16, max_humans=8)
    d_x = D.paf_decode_batch(
        jnp.asarray(conf[None]), jnp.asarray(paf[None]),
        D.PafDecoderConfig(gather_backend="xla", **base),
    )
    d_p = D.paf_decode_batch(
        jnp.asarray(conf[None]), jnp.asarray(paf[None]),
        D.PafDecoderConfig(gather_backend="pallas", **base),
    )
    assert np.array_equal(np.asarray(d_x.valid), np.asarray(d_p.valid))
    np.testing.assert_allclose(
        np.asarray(d_x.coords), np.asarray(d_p.coords), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_x.scores), np.asarray(d_p.scores), atol=1e-3
    )


def test_fused_peak_topk_matches_xla(rng):
    """Fused peaks kernel (interpreted) vs the XLA front end on interior
    blobs (border smoothing differs by design: zero-pad vs reflect)."""
    import hyperpose_tpu.ops.paf_decode as D
    from tests.test_paf_decode import TWO_PEOPLE, make_synthetic_maps

    conf, _ = make_synthetic_maps(TWO_PEOPLE)
    cfg_x = D.PafDecoderConfig(peaks_backend="xla")
    cfg_p = D.PafDecoderConfig(peaks_backend="pallas")
    cx = jnp.asarray(conf[None, ..., :18])
    xy_x, sc_x, va_x = D.find_peaks(cx, cfg_x)
    xy_p, sc_p, va_p = D.find_peaks(cx, cfg_p)
    assert np.array_equal(np.asarray(va_x), np.asarray(va_p))
    m = np.asarray(va_x)
    np.testing.assert_allclose(
        np.asarray(xy_x)[m], np.asarray(xy_p)[m], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sc_x)[m], np.asarray(sc_p)[m], atol=1e-5
    )


def test_decode_pallas_peaks_matches_xla(rng):
    """Full decode with the fused peaks kernel vs XLA front end."""
    import hyperpose_tpu.ops.paf_decode as D
    from tests.test_paf_decode import TWO_PEOPLE, make_synthetic_maps

    conf, paf = make_synthetic_maps(TWO_PEOPLE)
    base = dict(max_peaks=8, max_candidates=16, max_humans=8)
    d_x = D.paf_decode_batch(
        jnp.asarray(conf[None]), jnp.asarray(paf[None]),
        D.PafDecoderConfig(peaks_backend="xla", **base),
    )
    d_p = D.paf_decode_batch(
        jnp.asarray(conf[None]), jnp.asarray(paf[None]),
        D.PafDecoderConfig(peaks_backend="pallas", **base),
    )
    assert np.array_equal(np.asarray(d_x.valid), np.asarray(d_p.valid))
    np.testing.assert_allclose(
        np.asarray(d_x.coords), np.asarray(d_p.coords), atol=1e-4
    )
