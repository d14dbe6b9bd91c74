"""Dataset layer tests on synthetic fixtures
(mirrors reference tests/test_file_dataset.py)."""

import shutil

import numpy as np
import pytest

from segma_tpu.data import SegmaFileDataset, URISubsetLeakageError

CLASSES = ["male", "female", "key_child", "other_child"]


@pytest.fixture
def ds_root(synthetic_dataset, tmp_path):
    """Private copy of the session fixture so tests can mutate it."""
    root = tmp_path / "debug_5"
    shutil.copytree(synthetic_dataset, root)
    return root


def _mk(root, **kw):
    ds = SegmaFileDataset(root, CLASSES, chunk_duration_s=4.0, **kw)
    return ds


def test_init_loads_uris(ds_root):
    ds = _mk(ds_root)
    for subset in ("train", "val", "test"):
        assert len(ds.subset_to_uris[subset]) == 5
    assert not ds.is_loaded()


def test_missing_dataset_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        SegmaFileDataset(tmp_path / "nope", CLASSES, 4.0)


def test_load_populates_metadata(ds_root):
    ds = _mk(ds_root)
    ds.load(use_cache=False)
    assert ds.is_loaded()
    train = ds.train
    assert len(train.uris) == 5
    assert train.durations.shape[0] == 5
    assert len(train.indexes) == 5
    # 20 s files at 16 kHz
    assert np.all(train.durations["audio_duration_f"] == 20 * 16_000)
    assert np.all(train.durations["annotated_duration_f"] > 0)


def test_exclude_txt(ds_root):
    excluded = ["0000", "0005"]
    (ds_root / "exclude.txt").write_text("\n".join(excluded) + "\n")
    ds = _mk(ds_root)
    assert len(ds.subset_to_uris["train"]) == 4  # 0000 removed
    assert len(ds.subset_to_uris["val"]) == 4  # 0005 removed
    assert ds.removed_uris["exclude.txt"] == set(excluded)


def test_leakage_detection(ds_root):
    # put a val uri into train.txt
    train = (ds_root / "train.txt").read_text()
    (ds_root / "train.txt").write_text(train + "0005\n")
    with pytest.raises(URISubsetLeakageError):
        _mk(ds_root)


def test_invalid_audio_removed(ds_root):
    """A file shorter than one chunk gets dropped at load."""
    from segma_tpu.utils.io import write_data_to_disk

    short = np.zeros((1, 16_000), np.float32)  # 1 s < 4 s chunk
    write_data_to_disk(short, ds_root / "wav" / "0000", 16_000)
    ds = _mk(ds_root)
    ds.load(use_cache=False)
    assert "0000" in ds.removed_uris["invalid"]
    assert len(ds.train.uris) == 4


def test_duplicate_tracking(ds_root):
    train = (ds_root / "train.txt").read_text()
    (ds_root / "train.txt").write_text(train + "0001\n")
    ds = _mk(ds_root)
    assert ds.removed_uris["duplicate.train"] == ["0001"]


def test_cache_roundtrip(ds_root, tmp_path, monkeypatch):
    monkeypatch.setattr(SegmaFileDataset, "CACHE_ROOT", tmp_path / "cache")
    ds = _mk(ds_root)
    ds.load(use_cache=True)  # cold -> builds + saves
    durations_before = {k: v.copy() for k, v in ds.subds_to_durations.items()}

    ds2 = _mk(ds_root)
    ds2.load(use_cache=True)  # warm -> loads cache
    for k in durations_before:
        np.testing.assert_array_equal(
            ds2.subds_to_durations[k], durations_before[k]
        )


def test_cache_ttl(ds_root, tmp_path, monkeypatch):
    import os
    import time

    monkeypatch.setattr(SegmaFileDataset, "CACHE_ROOT", tmp_path / "cache")
    ds = _mk(ds_root)
    ds.load(use_cache=True)
    # age the cache files past the TTL
    old = time.time() - 3 * 86400
    for name in ("subds_to_durations", "subds_to_indexes"):
        p = ds._cache_path / name
        os.utime(p, (old, old))
    with pytest.raises(Exception):
        ds.load_cache(max_days=2.0)
    # load() transparently rebuilds
    ds2 = _mk(ds_root)
    ds2.load(use_cache=True)
    assert ds2.is_loaded()


def test_cache_distinguishes_same_stem_datasets(synthetic_dataset, tmp_path, monkeypatch):
    """Two datasets with the same directory name must not share caches
    (regression: a stale cache from another `debug_3` poisoned training)."""
    import shutil

    from scripts.generate_data import gen_classification

    monkeypatch.setattr(SegmaFileDataset, "CACHE_ROOT", tmp_path / "cache")
    ds_a_root = tmp_path / "a" / "debug_5"
    shutil.copytree(synthetic_dataset, ds_a_root)
    ds_b_root = tmp_path / "b" / "debug_5"
    gen_classification(output=ds_b_root, per_split=5, seed=999, audio_duration_s=20.0)

    a = _mk(ds_a_root)
    a.load(use_cache=True)
    b = _mk(ds_b_root)
    b.load(use_cache=True)
    # annotations differ between the datasets -> the cached indexes must too
    assert a._cache_path != b._cache_path
    assert not np.array_equal(
        a.subds_to_durations["train"]["annotated_duration_f"],
        b.subds_to_durations["train"]["annotated_duration_f"],
    )


def test_warm_cache_restores_filtered_uris(ds_root, tmp_path, monkeypatch):
    """Warm-cache load must restore the FILTERED uri lists — durations and
    indexes pair with uris positionally, and the raw disk lists still hold
    invalid uris (regression: round-2 review; the mismatch crashed the
    loader on every warm run after a file was dropped)."""
    from segma_tpu.utils.io import write_data_to_disk

    monkeypatch.setattr(SegmaFileDataset, "CACHE_ROOT", tmp_path / "cache")
    short = np.zeros((1, 16_000), np.float32)  # 1 s < 4 s chunk -> dropped
    write_data_to_disk(short, ds_root / "wav" / "0000", 16_000)

    ds = _mk(ds_root)
    ds.load(use_cache=True)  # cold: filters + saves
    assert len(ds.train.uris) == 4

    ds2 = _mk(ds_root)
    ds2.load(use_cache=True)  # warm: must match, not crash
    assert ds2.train.uris == ds.train.uris
    assert len(ds2.train.uris) == len(ds2.train.durations)


def test_editing_split_invalidates_cache(ds_root, tmp_path, monkeypatch):
    """Reordering train.txt with an unchanged count must NOT reuse the old
    cache (durations/indexes would pair with the wrong files)."""
    monkeypatch.setattr(SegmaFileDataset, "CACHE_ROOT", tmp_path / "cache")
    ds = _mk(ds_root)
    ds.load(use_cache=True)
    first_uri = ds.train.uris[0]
    first_dur = int(ds.train.durations["audio_duration_f"][0])

    lines = (ds_root / "train.txt").read_text().split()
    (ds_root / "train.txt").write_text("\n".join(reversed(lines)) + "\n")
    ds2 = _mk(ds_root)
    ds2.load(use_cache=True)
    # same uri still maps to the same duration after the reorder
    i = ds2.train.uris.index(first_uri)
    assert int(ds2.train.durations["audio_duration_f"][i]) == first_dur
    assert ds2.train.uris == list(reversed(ds.train.uris))


def test_inplace_regeneration_invalidates_cache(ds_root, tmp_path, monkeypatch):
    """Regenerating a dataset IN PLACE (same paths, new content) must bust
    the cache (regression: a regenerated fixture trained against the previous
    fixture's cached labels — val/F1 pinned at 0 while train loss fell,
    masquerading as a TPU-numerics bug for a whole debugging session)."""
    from scripts.generate_data import gen_classification

    monkeypatch.setattr(SegmaFileDataset, "CACHE_ROOT", tmp_path / "cache")
    ds = _mk(ds_root)
    ds.load(use_cache=True)
    stale = ds.subds_to_durations["train"]["annotated_duration_f"].copy()

    # regenerate the SAME directory with different content
    gen_classification(output=ds_root, per_split=5, seed=31337, audio_duration_s=20.0)

    ds2 = _mk(ds_root)
    ds2.load(use_cache=True)
    assert ds2._cache_path != ds._cache_path
    assert not np.array_equal(
        ds2.subds_to_durations["train"]["annotated_duration_f"], stale
    )


def test_clean_cache_removes_entries(ds_root, tmp_path, monkeypatch):
    monkeypatch.setattr(SegmaFileDataset, "CACHE_ROOT", tmp_path / "cache")
    ds = _mk(ds_root)
    ds.load(use_cache=True)
    assert any((tmp_path / "cache").iterdir())
    SegmaFileDataset.clean_cache(ds_root)
    assert not list((tmp_path / "cache").glob(f"{ds_root.stem}-*"))
    # and the dataset itself was never touched
    assert (ds_root / "train.txt").exists()


def test_noise_fixture_kind(tmp_path):
    """--kind noise renders octave-band noise per label: broadband (not a
    pure tone) yet spectrally separable, so lossy-transport DER can be
    measured without the sine fixture's harmonic-aliasing pathology."""
    from scripts.generate_data import gen_classification
    from segma_tpu.utils.io import get_all_samples

    root = tmp_path / "noise_ds"
    gen_classification(
        output=root, per_split=1, seed=5, audio_duration_s=60.0, kind="noise"
    )
    uid = (root / "train.txt").read_text().split()[0]
    audio = get_all_samples(root / "wav" / f"{uid}.wav")[0]
    tones = {label: 440 * (i + 1) for i, label in enumerate(CLASSES)}

    events = []
    for line in (root / "rttm" / f"{uid}.rttm").read_text().splitlines():
        parts = line.split()
        events.append((float(parts[3]), float(parts[4]), parts[7]))

    checked = 0
    for i, (t0, dur, label) in enumerate(events):
        # rendering lets later events overwrite earlier ones where they
        # overlap — only isolated events carry purely their own band
        if any(
            o0 < t0 + dur and t0 < o0 + odur
            for j, (o0, odur, _) in enumerate(events)
            if j != i
        ):
            continue
        a, b = int(t0 * 16_000), int((t0 + dur) * 16_000)
        seg = audio[a:b]
        if seg.size < 3200:
            continue
        spec = np.abs(np.fft.rfft(seg)) ** 2
        f = np.fft.rfftfreq(seg.size, d=1 / 16_000)
        lo, hi = tones[label] / np.sqrt(2), tones[label] * np.sqrt(2)
        in_band = spec[(f >= lo) & (f <= hi)].sum() / spec.sum()
        # energy concentrated in the label's octave, but NOT a single bin
        assert in_band > 0.9
        peak_share = spec.max() / spec.sum()
        assert peak_share < 0.5
        checked += 1
    assert checked >= 2


def test_torn_cache_rebuilds(ds_root, tmp_path, monkeypatch, capsys):
    """A torn cache pickle (process killed mid-write, disk corruption)
    must trigger a transparent rebuild with a warning — not crash every
    run until someone deletes .cache by hand."""
    monkeypatch.setattr(SegmaFileDataset, "CACHE_ROOT", tmp_path / "cache")
    ds = _mk(ds_root)
    ds.load(use_cache=True)
    expected = {k: v.copy() for k, v in ds.subds_to_durations.items()}

    (ds._cache_path / "subds_to_indexes").write_bytes(b"\x80TORN PICKLE")
    ds2 = _mk(ds_root)
    ds2.load(use_cache=True)  # rebuilds, re-saves
    assert "cache unreadable" in capsys.readouterr().out
    for k in expected:
        np.testing.assert_array_equal(ds2.subds_to_durations[k], expected[k])
    # the rebuilt cache is valid again
    ds3 = _mk(ds_root)
    ds3.load(use_cache=True)
    assert "cache unreadable" not in capsys.readouterr().out
