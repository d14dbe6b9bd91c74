"""Synthetic dataset generator — the universal test fixture.

Parity with reference ``scripts/generate_data.py:9-187``: each label maps to a
sine frequency (440*i Hz); random annotations are rendered into 16 kHz WAVs
and written out in the full SegmaFileDataset layout (wav/ aa/ rttm/ uem/ +
train/val/test split txts).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.utils.io import write_data_to_disk


def gen_annots(
    uid: str,
    audio_duration_s: float = 60.0,
    labels: list[str] = ["male", "female", "key_child", "other_child"],
    max_annot_duration_s: int = 3,
    min_annot_count: int = 4,
    max_annot_count: int = 10,
    rng: np.random.Generator | None = None,
) -> list[AudioAnnotation]:
    rng = rng or np.random.default_rng()
    n = int(rng.integers(min_annot_count, max_annot_count))
    durations_s = rng.uniform(0.2, max_annot_duration_s, size=n)
    starting_points_s = rng.uniform(0, audio_duration_s - max_annot_duration_s, size=n)
    starting_points_s.sort()
    label_idxs = rng.integers(len(labels), size=n)
    return [
        AudioAnnotation(
            uid=uid, start_time_s=float(s), duration_s=float(d), label=labels[i]
        )
        for s, d, i in zip(starting_points_s, durations_s, label_idxs)
    ]


def gen_sine(f: int = 440, duration_s: float = 1.0, sr: int = 16_000) -> np.ndarray:
    t = np.linspace(0, duration_s, int(sr * duration_s), endpoint=False)
    return np.sin(2 * np.pi * f * t).astype(np.float32)


def gen_audio_from_annot(
    annotations: list[AudioAnnotation],
    label_to_freq: dict[str, int],
    audio_duration_s: float = 60.0,
    sample_rate: int = 16_000,
) -> np.ndarray:
    n_samples = int(audio_duration_s * sample_rate)
    array = np.zeros((1, n_samples), dtype=np.float32)
    for annot in annotations:
        start_f = int(annot.start_time_s * sample_rate)
        duration_f = int(annot.duration_s * sample_rate)
        seg = gen_sine(label_to_freq[annot.label], duration_s=annot.duration_s)
        array[:, start_f : start_f + duration_f] = seg[:duration_f]
    return array


def gen_classification(
    output: Path = Path("data"),
    audio_duration_s: float = 60.0,
    labels: list[str] = ["male", "female", "key_child", "other_child"],
    per_split: int = 5,
    seed: int | None = None,
) -> None:
    """Generate a full SegmaFileDataset tree with synthetic sine audio."""
    rng = np.random.default_rng(seed)
    for sub in ("wav", "aa", "rttm", "uem"):
        (output / sub).mkdir(parents=True, exist_ok=True)

    _uids = [str(i).rjust(4, "0") for i in range(3 * per_split)]
    uids = {
        split: _uids[i * per_split : (i + 1) * per_split]
        for i, split in enumerate(("train", "val", "test"))
    }
    for split, s_uids in uids.items():
        with (output / f"{split}.txt").open("w") as f:
            f.writelines(uid + "\n" for uid in s_uids)

    label_to_freq = {label: 440 * i for i, label in enumerate(labels, start=1)}

    for split, s_uids in uids.items():
        for uid in s_uids:
            annots = gen_annots(
                uid, audio_duration_s=audio_duration_s, labels=labels, rng=rng
            )
            audio = gen_audio_from_annot(
                annots, label_to_freq, audio_duration_s=audio_duration_s
            )
            write_data_to_disk(audio, output / "wav" / uid, sample_rate=16_000)
            with (output / "aa" / f"{uid}.aa").open("w") as f:
                f.writelines(a.write() + "\n" for a in annots)
            with (output / "rttm" / f"{uid}.rttm").open("w") as f:
                f.writelines(a.to_rttm() + "\n" for a in annots)
            with (output / "uem" / f"{uid}.uem").open("w") as f:
                f.write(f"{uid} NA 0.000 {audio_duration_s}")


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-n", "--n_samples", required=True, type=int,
        help="Number of examples per split.",
    )
    parser.add_argument("--out", default="data")
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()

    db_path = Path(args.out) / f"debug_{args.n_samples}"
    if not db_path.exists():
        print(
            f"[log] - Generating a dummy dataset of size {args.n_samples * 3} "
            f"({args.n_samples} * 3)."
        )
        gen_classification(output=db_path, per_split=args.n_samples, seed=args.seed)
    else:
        print("[log] - dataset already exists, nothing will happen.")
