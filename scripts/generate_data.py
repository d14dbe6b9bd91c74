"""Synthetic fixture-dataset builder.

Produces the on-disk tree that :class:`segma_tpu.data.file_dataset.
SegmaFileDataset` expects (wav/ aa/ rttm/ uem/ + split txts), populated with
pure-tone "speech" events so every test and debug run has a dataset whose
ground truth is known exactly. The fixture *format* matches the reference
generator (``scripts/generate_data.py`` there): label *i* is rendered as a
440·i Hz sine, so a trained model can separate classes by frequency alone.

Unlike the reference, synthesis here is deterministic when seeded (the
whole tree is a pure function of ``seed``) and each file is rendered in one
vectorized pass rather than per-event Python loops over samples.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.utils.io import write_data_to_disk

DEFAULT_LABELS = ["male", "female", "key_child", "other_child"]
SAMPLE_RATE = 16_000


@dataclass(frozen=True)
class EventSpec:
    """Bounds for the random events drawn per file."""

    min_count: int = 4
    max_count: int = 10
    min_duration_s: float = 0.2
    max_duration_s: float = 3.0


def _draw_events(
    uid: str,
    rng: np.random.Generator,
    labels: list[str],
    audio_duration_s: float,
    spec: EventSpec = EventSpec(),
) -> list[AudioAnnotation]:
    """Sample a sorted list of labeled events inside ``[0, audio_duration_s)``."""
    count = int(rng.integers(spec.min_count, spec.max_count))
    starts = np.sort(
        rng.uniform(0.0, audio_duration_s - spec.max_duration_s, size=count)
    )
    lengths = rng.uniform(spec.min_duration_s, spec.max_duration_s, size=count)
    which = rng.integers(len(labels), size=count)
    return [
        AudioAnnotation(
            uid=uid, start_time_s=float(t0), duration_s=float(dt), label=labels[k]
        )
        for t0, dt, k in zip(starts, lengths, which)
    ]


def _render_waveform(
    events: list[AudioAnnotation],
    tone_hz: dict[str, int],
    audio_duration_s: float,
    sample_rate: int = SAMPLE_RATE,
    kind: str = "sine",
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Render events onto a silent track, (1, n) f32.

    Later events overwrite earlier ones where they overlap (matching the
    fixture contract: one audible tone at a time, annotations may still
    overlap on paper).

    ``kind='sine'`` renders each label as a phase-aligned pure tone at its
    ``tone_hz`` — the classic fixture, but pathological for lossy waveform
    transports (quantizer harmonics of 440·i land exactly in other labels'
    detection bands, see BENCH_REPORT.md). ``kind='noise'`` renders
    band-limited noise one octave wide centred on ``tone_hz`` instead:
    still separable by spectrum alone, but broadband like real speech, so
    it measures transport loss without the harmonic-aliasing pathology.
    """
    n = int(audio_duration_s * sample_rate)
    track = np.zeros(n, dtype=np.float32)
    for ev in events:
        a = int(ev.start_time_s * sample_rate)
        b = min(n, a + int(ev.duration_s * sample_rate))
        if kind == "sine":
            t = np.arange(b - a, dtype=np.float32) / sample_rate
            track[a:b] = np.sin(2.0 * np.pi * tone_hz[ev.label] * t)
        elif kind == "noise":
            assert rng is not None
            white = rng.standard_normal(b - a)
            spec = np.fft.rfft(white)
            f = np.fft.rfftfreq(b - a, d=1.0 / sample_rate)
            centre = float(tone_hz[ev.label])
            lo, hi = centre / np.sqrt(2.0), centre * np.sqrt(2.0)
            spec[(f < lo) | (f > hi)] = 0.0
            band = np.fft.irfft(spec, n=b - a)
            peak = np.max(np.abs(band))
            if peak > 0:
                band = band / peak * 0.7
            track[a:b] = band.astype(np.float32)
        else:
            raise ValueError(f"unknown fixture kind: {kind!r}")
    return track[None, :]


def gen_classification(
    output: Path = Path("data"),
    audio_duration_s: float = 60.0,
    labels: list[str] | None = None,
    per_split: int = 5,
    seed: int | None = None,
    kind: str = "sine",
) -> None:
    """Write a complete synthetic SegmaFileDataset tree under ``output``."""
    labels = list(labels) if labels is not None else list(DEFAULT_LABELS)
    rng = np.random.default_rng(seed)
    tone_hz = {label: 440 * (i + 1) for i, label in enumerate(labels)}

    for sub in ("wav", "aa", "rttm", "uem"):
        (output / sub).mkdir(parents=True, exist_ok=True)

    splits = ("train", "val", "test")
    all_uids = [f"{i:04d}" for i in range(per_split * len(splits))]
    split_uids = {
        split: all_uids[k * per_split : (k + 1) * per_split]
        for k, split in enumerate(splits)
    }
    for split, uids in split_uids.items():
        (output / f"{split}.txt").write_text("".join(u + "\n" for u in uids))

    for uids in split_uids.values():
        for uid in uids:
            events = _draw_events(uid, rng, labels, audio_duration_s)
            wave = _render_waveform(
                events, tone_hz, audio_duration_s, kind=kind, rng=rng
            )
            write_data_to_disk(wave, output / "wav" / uid, sample_rate=SAMPLE_RATE)
            (output / "aa" / f"{uid}.aa").write_text(
                "".join(ev.write() + "\n" for ev in events)
            )
            (output / "rttm" / f"{uid}.rttm").write_text(
                "".join(ev.to_rttm() + "\n" for ev in events)
            )
            (output / "uem" / f"{uid}.uem").write_text(
                f"{uid} NA 0.000 {audio_duration_s}"
            )


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument(
        "-n", "--n_samples", required=True, type=int,
        help="files per split (total = 3n)",
    )
    parser.add_argument("--out", default="data")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument(
        "--kind", choices=("sine", "noise"), default="sine",
        help="event waveforms: pure tones (classic fixture) or octave-band "
        "noise (broadband, for lossy-transport validation)",
    )
    args = parser.parse_args()

    suffix = "" if args.kind == "sine" else f"_{args.kind}"
    root = Path(args.out) / f"debug_{args.n_samples}{suffix}"
    if root.exists():
        print(f"[generate_data] {root} already exists — leaving it untouched.")
        return
    print(f"[generate_data] writing {3 * args.n_samples} synthetic files to {root}")
    gen_classification(
        output=root, per_split=args.n_samples, seed=args.seed, kind=args.kind
    )


if __name__ == "__main__":
    main()
