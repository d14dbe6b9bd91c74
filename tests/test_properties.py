"""Property-based tests (hypothesis) for the load-bearing math.

The frame-grid geometry, interval merge, and ADPCM codec are the places
where a silent off-by-one corrupts every downstream timestamp; these
properties pin them against independent oracles (a real convolution for
the rf equations, brute force for the merge, the numpy reference for the
codec) over randomized inputs, not just the golden fixtures.
"""

import jax
import numpy as np
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

# NB: the deterministic "segma_ci" hypothesis profile is loaded by
# tests/conftest.py so it covers every test module, not just this one

from segma_tpu.models.geometry import ConvolutionSettings

# conv stacks: 1-4 layers of (kernel, stride, padding) within sane ranges
_layer = st.tuples(
    st.integers(1, 12),  # kernel
    st.integers(1, 6),  # stride
    st.integers(0, 6),  # padding
)
_stack = st.lists(_layer, min_size=1, max_size=4)


def _make(stack):
    k, s, p = zip(*stack)
    return ConvolutionSettings(kernels=k, strides=s, paddings=p)


@settings(max_examples=60, deadline=None)
@given(stack=_stack, n=st.integers(30, 400))
def test_n_windows_consistent_with_rf_bounds(stack, n):
    """n_windows agrees with the rf equations it is derived from (which
    test_rf_bounds_match_gradient_support pins to real convolutions):
    strict counts exactly the frames whose receptive field lies inside the
    input; both modes are bounded by the raw conv output length."""
    cs = _make(stack)
    length = n
    for k, s, p in stack:
        length = (length + 2 * p - k) // s + 1
        if length <= 0:
            return  # stack swallows the input
    strict = cs.n_windows(n, strict=True)
    loose = cs.n_windows(n, strict=False)
    # strict counts fully-contained receptive fields — a subset of the
    # real conv's output frames; loose is the reference's grid convention
    # (n // step) and carries no containment guarantee
    assert 0 <= strict <= length and loose >= 0
    # exact strict boundary: when frame 0's rf starts inside the input
    # (no padding shift) and kernels are odd (no even-kernel grid
    # correction), the contained frames are exactly the prefix 0..strict-1
    if all(k % 2 for k in cs.kernels) and cs.rf_start_i(0) >= 0:
        if strict > 0:
            assert cs.rf_start_i(strict - 1) >= 0
            assert cs.rf_end_i(strict - 1) < n
        # the next frame's receptive field would poke outside
        assert cs.rf_end_i(strict) >= n


@settings(max_examples=40, deadline=None)
@given(stack=_stack, f=st.integers(0, 50))
def test_rf_bounds_match_gradient_support(stack, f):
    """rf_start/rf_end describe the EXACT dependence window of output
    frame f for a real (all-ones kernel) conv stack — checked by finite
    differences at the declared boundary samples.

    Restricted to kernel >= stride layers: smaller kernels leave HOLES in
    the receptive field (the distill equations give outer bounds only).
    Every model stack in the framework satisfies k >= s."""
    assume(all(k >= s for k, s, _ in stack))
    cs = _make(stack)
    n = max(cs.rf_end_i(f) + 10, 40)
    if n > 3000:
        return  # keep runtime bounded

    def forward(x):
        y = x[None, :, None]
        for k, s, p in stack:
            y = jax.lax.conv_general_dilated(
                y,
                np.ones((k, 1, 1), np.float32),
                window_strides=(s,),
                padding=[(p, p)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        return y[0, :, 0]

    out_len = forward(np.zeros(n, np.float32)).shape[0]
    if f >= out_len:
        return
    base = np.asarray(forward(np.zeros(n, np.float32)))

    def changes(t):
        x = np.zeros(n, np.float32)
        x[t] = 1.0
        return not np.isclose(float(np.asarray(forward(x))[f]), float(base[f]))

    lo, hi = cs.run_interval(f, f)  # [lo, hi) sample window of frame f
    lo_c, hi_c = max(0, lo), min(n, hi)
    if lo_c < hi_c:
        assert changes(lo_c), "frame must depend on its first rf sample"
        assert changes(hi_c - 1), "frame must depend on its last rf sample"
    if 0 < lo <= n:
        assert not changes(lo - 1), "dependence before declared rf start"
    if 0 <= hi < n:  # hi can be negative when the rf lies fully in padding
        assert not changes(hi), "dependence after declared rf end"


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),
            st.integers(1, 30),
            st.sampled_from(["a", "b", "c"]),
        ),
        max_size=25,
    )
)
def test_interval_merge_matches_brute_force(items):
    """Intervals' per-label merge == brute-force membership computation."""
    from segma_tpu.structs.interval import Intervals

    ivs = [(s, s + d, label) for s, d, label in items]
    merged = list(Intervals(ivs))

    # oracle: per-label covered-point sets
    for label in "abc":
        covered = set()
        for s, e, lb in ivs:
            if lb == label:
                covered.update(range(s, e))
        got = set()
        for s, e, lb in merged:
            if lb == label:
                got.update(range(int(s), int(e)))
        assert got == covered
    # merged runs of one label never overlap or touch
    by_label: dict = {}
    for s, e, lb in merged:
        by_label.setdefault(lb, []).append((s, e))
    for runs in by_label.values():
        runs.sort()
        for (s1, e1), (s2, _e2) in zip(runs, runs[1:]):
            assert e1 < s2


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 700),
    seed=st.integers(0, 2**31),
    amp=st.floats(1.0, 30000.0),
)
def test_adpcm_roundtrip_properties(n, seed, amp):
    """Codec invariants over random lengths/amplitudes: jax and numpy
    decodes agree bit-exactly, output length is exact, and the error is
    bounded by the per-block scale the encoder chose."""
    from segma_tpu.ops.adpcm import (
        BLOCK,
        SCALE_TABLE,
        adpcm_decode_np,
        adpcm_encode,
        encoded_nbytes,
    )

    rng = np.random.default_rng(seed)
    x = np.clip(
        rng.standard_normal(n) * amp, -32767, 32767
    ).astype(np.int16)
    enc = adpcm_encode(x)
    assert enc.shape[-1] == encoded_nbytes(n)
    dec = adpcm_decode_np(enc, n) * 32768.0
    assert dec.shape[-1] == n

    # per-block error bound: closed-loop quantization error <= scale
    # (residual grid spacing), slightly more at clip (bounded by 9*scale)
    nb = enc.shape[-1] // 35
    hdr = enc.reshape(nb, 35)[:, 2]
    scales = SCALE_TABLE[hdr & 63]
    err = np.abs(dec - x.astype(np.float64))
    for bi in range(nb):
        blk = err[bi * BLOCK : (bi + 1) * BLOCK]
        assert blk.max(initial=0) <= 9 * scales[bi] + 1e-6


@settings(max_examples=40, deadline=None)
@given(
    chunk_f=st.sampled_from([16_000, 32_000, 64_000]),
    n=st.integers(0, 200_000),
)
def test_total_frames_monotonic_and_grid_aligned(chunk_f, n):
    """Chunkyfier.total_frames never decreases with more audio and every
    counted frame's receptive field start lies inside the audio."""
    from segma_tpu.inference import Chunkyfier

    cs = ConvolutionSettings((320,), (320,), (0,))
    ck = Chunkyfier(1, chunk_f, cs)
    t = ck.total_frames(n)
    assert t >= 0
    assert ck.total_frames(n + 320) >= t
    if t > 0:
        # the last counted frame starts within the real audio
        assert (t - 1) * cs.rf_step < n


@settings(max_examples=80, deadline=None)
@given(
    a=st.lists(st.tuples(st.integers(0, 40), st.integers(1, 15)), max_size=10),
    b=st.lists(st.tuples(st.integers(0, 40), st.integers(1, 15)), max_size=10),
)
def test_intersection_duration_matches_point_counting(a, b):
    """_intersection_duration over merged segment lists == integer point
    counting (the evaluator's macro-F numerator ground truth)."""
    from segma_tpu.evaluate import _intersection_duration
    from segma_tpu.structs.interval import Intervals

    def merged(items):
        return [(s, e) for s, e, _ in Intervals([(s, s + d, "x") for s, d in items])]

    ma, mb = merged(a), merged(b)
    got = _intersection_duration(ma, mb)
    pa = {p for s, e in ma for p in range(int(s), int(e))}
    pb = {p for s, e in mb for p in range(int(s), int(e))}
    assert got == len(pa & pb)


@settings(max_examples=30, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.floats(0.0, 50.0, allow_nan=False),
            st.floats(0.1, 10.0, allow_nan=False),
            st.sampled_from(["male", "female"]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_evaluator_identity(items):
    """Scoring any annotation set against itself gives F=1 and DER=0."""
    from segma_tpu.annotation import AudioAnnotation
    from segma_tpu.evaluate import MacroAverageFMeasure

    annots = [
        AudioAnnotation(uid="u", start_time_s=s, duration_s=d, label=lb)
        for s, d, lb in items
    ]
    m = MacroAverageFMeasure(classes=["male", "female"])
    m(annots, annots, uri="u")
    assert abs(m) == pytest.approx(1.0)
    assert m.der() == pytest.approx(0.0)


# -- device-cache offset math (round-5 VERDICT item 6) -------------------------
#
# The flat-buffer slot layout is the highest-consequence address arithmetic
# in the training path: a slot sized from the wrong duration lets a crop's
# dynamic_slice slide into the NEXT file's audio (the real pre-c1418c1
# bug). Property: for randomized (disk length, metadata duration, channel
# layout) mixtures, every crop start the sampler can draw gathers exactly
# what the host path reads — real samples + trailing zeros, bit for bit.

_counter = [0]


@settings(max_examples=20, deadline=None)
@given(
    files=st.lists(
        st.tuples(
            st.integers(1, 3000),  # samples actually on disk
            st.integers(1, 3000),  # metadata-claimed duration (may differ)
            st.booleans(),  # stereo? (forces the f32 buffer path)
        ),
        min_size=2,
        max_size=4,
    ),
    chunk_f=st.integers(40, 1200),
)
def test_device_cache_crops_match_host_reads(files, chunk_f, tmp_path_factory):
    import wave

    from segma_tpu.data.device_cache import DeviceAudioCache
    from segma_tpu.data.file_dataset import DatasetSubset
    from segma_tpu.utils.io import get_samples_in_range, read_pcm16_mono

    _counter[0] += 1
    root = tmp_path_factory.mktemp("devcache") / f"ex{_counter[0]}"
    wav_dir = root / "wav"
    wav_dir.mkdir(parents=True)
    uris, durs = [], []
    for i, (disk_len, meta_dur, stereo) in enumerate(files):
        # per-file unique, nowhere-zero content: zero-pad reads and
        # cross-slot reads are both detectable
        mono = ((np.arange(disk_len) * 31 + 997 * (i + 1)) % 1000 + 1).astype(
            np.int16
        )
        data = np.repeat(mono, 2) if stereo else mono
        with wave.open(str(wav_dir / f"f{i}.wav"), "wb") as w:
            w.setnchannels(2 if stereo else 1)
            w.setsampwidth(2)
            w.setframerate(16_000)
            w.writeframes(data.tobytes())
        uris.append(f"f{i}")
        durs.append((meta_dur, meta_dur))
    subset = DatasetSubset(
        uris=uris,
        durations=np.array(
            durs,
            dtype=[("audio_duration_f", "i8"), ("annotated_duration_f", "i8")],
        ),
        indexes=[None] * len(uris),
    )
    cache = DeviceAudioCache.build(subset, root, chunk_f)
    flat, bases = cache.host_flat, cache.bases
    f32 = flat.dtype == np.float32

    for i, (disk_len, meta_dur, stereo) in enumerate(files):
        path = wav_dir / f"f{i}.wav"
        # every start the sampler can draw: rng.integers(0, max(1, high))
        high = max(1, meta_dur - chunk_f)
        for start in {0, high // 2, high - 1}:
            got = np.asarray(flat[bases[i] + start : bases[i] + start + chunk_f])
            assert got.shape == (chunk_f,), "crop crossed the buffer end"
            # host oracle: the sampler's uncached read + zero-pad
            if f32:
                w = get_samples_in_range(path, start, chunk_f)
                want = (w.mean(axis=0) if w.shape[0] > 1 else w[0]).astype(
                    np.float32
                )
            else:
                want = read_pcm16_mono(path)[start : start + chunk_f]
            want = np.pad(want, (0, chunk_f - want.shape[0]))
            # bit-for-bit: any mismatch is either a slot-boundary crossing
            # (next file's samples) or a normalization drift
            np.testing.assert_array_equal(got, want)
