"""Waveform augmentation ops: semantic invariants of the slice-based
implementations (timeshift = zero-filled roll; noise mixing = circular bank
window), brute-force-checked on small shapes.

These ops were rewritten from per-element take_along_axis gathers to vmapped
contiguous dynamic slices (one index per row) for TPU; these tests pin that
the semantics survived (ref TimeshiftTransform transform.py:120-144,
DatasetMixer transform.py:199-232).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from howl_tpu.ops.augment import AugmentConfig, mix_noise_bank, timeshift


def _roll_zero(row: np.ndarray, s: int) -> np.ndarray:
    """Shift right by s (left if negative), zero-filling — the op's contract."""
    out = np.zeros_like(row)
    n = row.shape[0]
    if s >= 0:
        out[s:] = row[: n - s]
    else:
        out[: n + s] = row[-s:]
    return out


def test_timeshift_is_zero_filled_roll():
    cfg = dataclasses.replace(AugmentConfig(), prob=1.0, timeshift_max_s=0.25, sample_rate=64)
    n, b = 64, 16
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((b, n)).astype(np.float32)
    out = np.asarray(timeshift(jnp.asarray(audio), jax.random.PRNGKey(1), cfg))
    max_shift = min(int(0.25 * 64), n // 2)
    for i in range(b):
        matches = [
            s for s in range(-max_shift, max_shift + 1)
            if np.allclose(out[i], _roll_zero(audio[i], s), atol=1e-6)
        ]
        assert matches, f"row {i} is not any zero-filled roll of the input"


def test_timeshift_onehot_matches_gather_bitwise():
    """The one-hot permutation-matmul shift is bitwise identical to a per-row
    dynamic_slice gather at the same (chunk-quantized) starts
    (HIGHEST-precision one-hot x f32 products are exact), including rows the
    prob mask skips."""
    from howl_tpu.ops import augment

    cfg = dataclasses.replace(AugmentConfig(), prob=0.6, timeshift_max_s=0.25, sample_rate=16000)
    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.standard_normal((8, 8000)).astype(np.float32))
    assert augment._shift_chunk(8000) > 0
    fast = np.asarray(timeshift(audio, jax.random.PRNGKey(11), cfg))
    slow = np.asarray(timeshift(audio, jax.random.PRNGKey(11), cfg, _force_gather=True))
    np.testing.assert_array_equal(fast, slow)
    assert not np.array_equal(fast, np.asarray(audio))  # something shifted


def test_timeshift_matmul_shifts_are_chunk_quantized():
    """Production windows shift on the chunk grid (c = 125 at n = 8000): every
    applied row is a zero-filled roll by a multiple of c, and the grid's
    extremes are reachable. Small windows (grid coarser than _MIN_SHIFT_STEPS)
    keep sample-exact shifts via the gather."""
    from howl_tpu.ops import augment

    cfg = dataclasses.replace(AugmentConfig(), prob=1.0, timeshift_max_s=0.25, sample_rate=16000)
    rng = np.random.default_rng(19)
    n, c = 8000, augment._shift_chunk(8000)
    audio = rng.standard_normal((64, n)).astype(np.float32)
    out = np.asarray(timeshift(jnp.asarray(audio), jax.random.PRNGKey(2), cfg))
    pad = n // 2
    shifts = []
    for i in range(out.shape[0]):
        match = [s for s in range(-pad, pad + 1, c)
                 if np.array_equal(out[i], _roll_zero(audio[i], s))]
        assert match, f"row {i} is not a chunk-grid roll"
        shifts.append(match[0])
    assert len({abs(s) for s in shifts}) >= augment._MIN_SHIFT_STEPS // 2  # diverse grid
    # small window: gate trips (16-sample max shift vs 64-sample chunks) ->
    # sample-exact gather; at prob=1 some row must shift by a NON-multiple of
    # the would-be chunk
    cfg_small = dataclasses.replace(AugmentConfig(), prob=1.0, timeshift_max_s=0.25, sample_rate=64)
    small = rng.standard_normal((32, 64)).astype(np.float32)
    out_s = np.asarray(timeshift(jnp.asarray(small), jax.random.PRNGKey(3), cfg_small))
    small_shifts = set()
    for i in range(out_s.shape[0]):
        for s in range(-16, 17):
            if np.array_equal(out_s[i], _roll_zero(small[i], s)):
                small_shifts.add(s)
                break
    assert any(s % 64 for s in small_shifts), f"small-window shifts quantized: {small_shifts}"


def test_timeshift_fallback_geometry():
    """A window length with no divisor in [64, 128] uses the gather path."""
    from howl_tpu.ops.augment import _shift_chunk

    assert _shift_chunk(8000) == 125
    assert _shift_chunk(7993) == 0  # prime
    # 7928 = 8 * 991: its only small divisors (8, 56, ...) are below the 64
    # floor — a c=8 one-hot would materialize O(b*(n/8)^2) = GBs; must gather
    assert _shift_chunk(7928) == 0
    # a small shift range picks a smaller chunk that still offers >= 8 steps
    # instead of losing the matmul (timeshift_max_s=0.05 -> pad=800)
    assert _shift_chunk(8000, pad=800) == 100
    # and a tiny range (no divisor can give 8 steps) falls back to the gather
    assert _shift_chunk(8000, pad=300) == 0
    cfg = dataclasses.replace(AugmentConfig(), prob=1.0, timeshift_max_s=0.1, sample_rate=16000)
    rng = np.random.default_rng(9)
    audio = jnp.asarray(rng.standard_normal((4, 7993)).astype(np.float32))
    out = np.asarray(timeshift(audio, jax.random.PRNGKey(5), cfg))
    assert out.shape == audio.shape and np.isfinite(out).all()


def test_timeshift_prob_zero_is_identity():
    cfg = dataclasses.replace(AugmentConfig(), prob=0.0)
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((4, 128)).astype(np.float32)
    out = np.asarray(timeshift(jnp.asarray(audio), jax.random.PRNGKey(3), cfg))
    np.testing.assert_array_equal(out, audio)


def test_mix_replace_yields_exact_circular_bank_windows():
    cfg = dataclasses.replace(AugmentConfig(), prob=1.0)
    n, b = 48, 8
    rng = np.random.default_rng(4)
    bank = rng.standard_normal((5, 96)).astype(np.float32)
    audio = rng.standard_normal((b, n)).astype(np.float32)
    mixed, replaced = mix_noise_bank(
        jnp.asarray(audio), jax.random.PRNGKey(5), jnp.asarray(bank), cfg, replace_prob=1.0
    )
    mixed, replaced = np.asarray(mixed), np.asarray(replaced)
    assert replaced.all()
    doubled = np.concatenate([bank, bank], axis=1)
    for i in range(b):
        found = any(
            np.allclose(mixed[i], doubled[r, o : o + n], atol=1e-6)
            for r in range(bank.shape[0])
            for o in range(bank.shape[1])
        )
        assert found, f"row {i} is not a circular window of any bank row"


def test_mix_window_longer_than_bank_wraps():
    cfg = dataclasses.replace(AugmentConfig(), prob=1.0)
    n, b = 40, 4
    rng = np.random.default_rng(6)
    bank = rng.standard_normal((3, 16)).astype(np.float32)  # bank shorter than window
    audio = rng.standard_normal((b, n)).astype(np.float32)
    mixed, _ = mix_noise_bank(
        jnp.asarray(audio), jax.random.PRNGKey(7), jnp.asarray(bank), cfg, replace_prob=1.0
    )
    mixed = np.asarray(mixed)
    tiled = np.concatenate([bank] * 4, axis=1)
    for i in range(b):
        found = any(
            np.allclose(mixed[i], tiled[r, o : o + n], atol=1e-6)
            for r in range(bank.shape[0])
            for o in range(bank.shape[1])
        )
        assert found, f"row {i} does not wrap the short bank correctly"


def test_mix_pallas_kernel_matches_fallback():
    """The fused DMA gather+mix kernel (interpret mode on CPU) matches the
    dynamic-slice fallback for the same key: same windows, same replace mask,
    and a batch that needs padding to the kernel's examples-per-block. On the
    real TPU the two paths measured bitwise identical; under CPU interpret
    mode the partially-mixed rows may differ by 1 ulp (the fallback's
    ``a*(1-w)+n*w`` is FMA-contracted by XLA, the interpreted kernel is not),
    so replaced (w=1) and skipped (w=0) rows assert exact and mixed rows
    assert to a 1-ulp tolerance."""
    cfg = dataclasses.replace(AugmentConfig(), prob=0.6)
    rng = np.random.default_rng(11)
    bank = rng.standard_normal((4, 8192)).astype(np.float32)  # >= 8 quanta wide
    audio = rng.standard_normal((5, 2000)).astype(np.float32)  # 5 % 8 != 0
    key = jax.random.PRNGKey(13)
    fast, rep_f = mix_noise_bank(
        jnp.asarray(audio), key, jnp.asarray(bank), cfg, replace_prob=0.3, use_pallas=True
    )
    slow, rep_s = mix_noise_bank(
        jnp.asarray(audio), key, jnp.asarray(bank), cfg, replace_prob=0.3, use_pallas=False
    )
    fast, slow = np.asarray(fast), np.asarray(slow)
    rep = np.asarray(rep_f)
    np.testing.assert_array_equal(rep, np.asarray(rep_s))
    np.testing.assert_array_equal(fast[rep], slow[rep])  # replaced: exact
    untouched = np.all(slow == audio, axis=1)  # skipped rows: exact passthrough
    np.testing.assert_array_equal(fast[untouched], slow[untouched])
    np.testing.assert_allclose(fast, slow, atol=5e-7, rtol=0)
    assert not np.array_equal(fast, audio)  # something mixed


def test_mix_offsets_quantized_for_wide_banks():
    """Banks >= MIN_QUANTIZED_STARTS quanta wide draw window starts only at
    multiples of the DMA alignment quantum (replace mode makes windows
    directly observable)."""
    from howl_tpu.ops.augment import MIN_QUANTIZED_STARTS
    from howl_tpu.ops.augment_pallas import NOISE_OFFSET_QUANTUM

    cfg = dataclasses.replace(AugmentConfig(), prob=1.0)
    rng = np.random.default_rng(12)
    bank = rng.standard_normal((3, MIN_QUANTIZED_STARTS * NOISE_OFFSET_QUANTUM)).astype(np.float32)
    audio = rng.standard_normal((16, 64)).astype(np.float32)
    mixed, replaced = mix_noise_bank(
        jnp.asarray(audio), jax.random.PRNGKey(21), jnp.asarray(bank), cfg,
        replace_prob=1.0, use_pallas=False,
    )
    mixed = np.asarray(mixed)
    assert np.asarray(replaced).all()
    starts = {o for o in range(0, bank.shape[1], NOISE_OFFSET_QUANTUM)}
    for i in range(mixed.shape[0]):
        found = any(
            np.allclose(mixed[i], bank[r, o : o + 64], atol=1e-6)
            for r in range(bank.shape[0])
            for o in starts
        )
        assert found, f"row {i} window start is not quantum-aligned"


def test_mix_draws_last_aligned_start():
    """The ceil-divided offset draw reaches the final aligned start below the
    bank width (floor division would drop it for non-multiple widths)."""
    from howl_tpu.ops.augment import MIN_QUANTIZED_STARTS as S
    from howl_tpu.ops.augment_pallas import NOISE_OFFSET_QUANTUM as Q

    cfg = dataclasses.replace(AugmentConfig(), prob=1.0)
    rng = np.random.default_rng(31)
    # width S*Q + 476: starts {0, Q, ..., S*Q} (ceil gives S+1 of them)
    bank = rng.standard_normal((1, S * Q + 476)).astype(np.float32)
    audio = rng.standard_normal((256, 32)).astype(np.float32)
    mixed, _ = mix_noise_bank(
        jnp.asarray(audio), jax.random.PRNGKey(5), jnp.asarray(bank), cfg,
        replace_prob=1.0, use_pallas=False,
    )
    mixed = np.asarray(mixed)
    seen = set()
    for i in range(mixed.shape[0]):
        for o in range(0, S * Q + 1, Q):
            # the last start S*Q wraps: window bank[0, S*Q : S*Q+32] exists
            if np.allclose(mixed[i], bank[0, o : o + 32], atol=1e-6):
                seen.add(o)
    assert S * Q in seen and 0 in seen, f"starts drawn: {sorted(seen)}"


def test_mix_narrow_bank_keeps_sample_exact_starts():
    """Banks below MIN_QUANTIZED_STARTS quanta draw sample-exact window starts
    (quantizing a just-over-1024 bank would collapse diversity to 1-2 starts),
    and an explicit use_pallas=True on such a bank raises instead of silently
    taking the fallback."""
    import pytest

    from howl_tpu.ops.augment_pallas import NOISE_OFFSET_QUANTUM as Q

    from howl_tpu.ops.augment import _bank_quantized

    # the flagship 0.5 s recipe's (N, 8000) train bank must STAY quantized
    # (ceil(8000/1024) = 8 starts feed the Pallas kernel, train.py:331)
    assert _bank_quantized(8000)
    assert not _bank_quantized(7 * Q)

    cfg = dataclasses.replace(AugmentConfig(), prob=1.0)
    rng = np.random.default_rng(41)
    bank = rng.standard_normal((1, Q + 500)).astype(np.float32)  # 1 quantum + change
    audio = rng.standard_normal((128, 16)).astype(np.float32)
    mixed, _ = mix_noise_bank(
        jnp.asarray(audio), jax.random.PRNGKey(3), jnp.asarray(bank), cfg,
        replace_prob=1.0, use_pallas=False,
    )
    mixed = np.asarray(mixed)
    doubled = np.concatenate([bank, bank[:, :16]], axis=1)
    starts = set()
    for i in range(mixed.shape[0]):
        for o in range(bank.shape[1]):
            if np.allclose(mixed[i], doubled[0, o : o + 16], atol=1e-6):
                starts.add(o)
                break
    # 128 draws over 1524 sample-exact starts: far more than the 2 quantized
    # starts this width would allow — diversity is preserved
    assert len(starts) > 16, f"only {len(starts)} distinct starts drawn"
    assert any(o % Q for o in starts), "all drawn starts are quantum-aligned"
    with pytest.raises(ValueError, match="use_pallas=True requires"):
        mix_noise_bank(
            jnp.asarray(audio), jax.random.PRNGKey(3), jnp.asarray(bank), cfg,
            replace_prob=1.0, use_pallas=True,
        )


def test_timeshift_preserves_dtype():
    """The one-hot matmul path upcasts to f32 internally but must hand back
    the caller's dtype (bf16 training batches) like the gather path does."""
    cfg = dataclasses.replace(AugmentConfig(), prob=0.7, timeshift_max_s=0.25, sample_rate=16000)
    rng = np.random.default_rng(13)
    from howl_tpu.ops import augment

    assert augment._shift_chunk(8000) > 0  # exercises the matmul path
    audio = jnp.asarray(rng.standard_normal((4, 8000)).astype(np.float32)).astype(jnp.bfloat16)
    out = timeshift(audio, jax.random.PRNGKey(6), cfg)
    assert out.dtype == jnp.bfloat16


def test_mix_prepared_bank_matches_raw_and_validates_window():
    """A PreparedNoiseBank gives identical draws/results to the raw-array form
    for the same key, and rejects a mismatched window size loudly."""
    import pytest

    from howl_tpu.ops.augment import prepare_noise_bank

    cfg = dataclasses.replace(AugmentConfig(), prob=0.7)
    rng = np.random.default_rng(17)
    bank = rng.standard_normal((3, 8192)).astype(np.float32)
    audio = rng.standard_normal((6, 2000)).astype(np.float32)
    prep = prepare_noise_bank(jnp.asarray(bank), 2000)
    for use_pallas in (False, True):
        m_raw, r_raw = mix_noise_bank(
            jnp.asarray(audio), jax.random.PRNGKey(2), jnp.asarray(bank), cfg,
            replace_prob=0.25, use_pallas=use_pallas,
        )
        m_prep, r_prep = mix_noise_bank(
            jnp.asarray(audio), jax.random.PRNGKey(2), prep, cfg,
            replace_prob=0.25, use_pallas=use_pallas,
        )
        np.testing.assert_array_equal(np.asarray(r_raw), np.asarray(r_prep))
        np.testing.assert_array_equal(np.asarray(m_raw), np.asarray(m_prep))
    with pytest.raises(ValueError, match="prepared for 2000"):
        mix_noise_bank(jnp.asarray(audio[:, :1000]), jax.random.PRNGKey(2), prep, cfg)


def test_timeshift_skipped_rows_bitwise_verbatim():
    """prob<1 rows must come back byte-identical — including -0.0 and NaN
    samples, which the one-hot matmul alone would rewrite."""
    cfg = dataclasses.replace(AugmentConfig(), prob=0.0, timeshift_max_s=0.25, sample_rate=64)
    rng = np.random.default_rng(23)
    audio = rng.standard_normal((8, 64)).astype(np.float32)
    audio[0, 3] = -0.0
    audio[1, 5] = np.nan
    audio[2, 7] = np.inf
    out = np.asarray(timeshift(jnp.asarray(audio), jax.random.PRNGKey(4), cfg))
    np.testing.assert_array_equal(
        out.view(np.uint32), audio.view(np.uint32)
    )  # bit-level, catches -0.0 -> +0.0


def test_mix_alpha_zero_prob_keeps_audio():
    cfg = dataclasses.replace(AugmentConfig(), prob=0.0)
    rng = np.random.default_rng(8)
    bank = rng.standard_normal((2, 64)).astype(np.float32)
    audio = rng.standard_normal((4, 32)).astype(np.float32)
    mixed, replaced = mix_noise_bank(jnp.asarray(audio), jax.random.PRNGKey(9), jnp.asarray(bank), cfg)
    np.testing.assert_allclose(np.asarray(mixed), audio, atol=1e-7)
    assert not np.asarray(replaced).any()
