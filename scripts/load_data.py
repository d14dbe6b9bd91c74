"""pyannote.database ``database.yml`` -> SegmaFileDataset importer.

Parity with reference ``scripts/load_data.py:26-179``: walks the RTTM/UEM
protocol entries of a pyannote database file, symlinks the referenced wavs,
copies RTTMs, converts RTTM lines to the ``.aa`` format, and writes the
train/val(development)/test uri lists.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segma_tpu.annotation import AudioAnnotation

SPLIT_ALIASES = {
    "train": "train",
    "development": "val",
    "dev": "val",
    "val": "val",
    "test": "test",
}


def _expand(template: str, uri: str, base: Path) -> Path:
    """Resolve a pyannote path template like ``.../{uri}.rttm``."""
    p = Path(template.format(uri=uri))
    return p if p.is_absolute() else base / p


def import_protocol(
    database_yml: Path, protocol: str | None, output: Path
) -> None:
    database_yml = Path(database_yml)
    base = database_yml.parent
    with database_yml.open() as f:
        db = yaml.safe_load(f)

    protocols = db.get("Protocols", {})
    if not protocols:
        raise ValueError("no Protocols section in database.yml")
    db_name = protocol.split(".")[0] if protocol else next(iter(protocols))
    task_tree = protocols[db_name]
    # task type layer (e.g. SpeakerDiarization) -> protocol name -> splits
    task_name = next(iter(task_tree))
    proto_name = (
        protocol.split(".")[-1] if protocol and "." in protocol
        else next(iter(task_tree[task_name]))
    )
    splits = task_tree[task_name][proto_name]

    wav_templates = db.get("Databases", {}).get(db_name)
    if isinstance(wav_templates, str):
        wav_templates = [wav_templates]

    for sub in ("wav", "rttm", "aa", "uem"):
        (output / sub).mkdir(parents=True, exist_ok=True)

    for split_key, spec in splits.items():
        split = SPLIT_ALIASES.get(split_key)
        if split is None:
            continue
        uris: list[str] = []
        annotation_tpl = spec.get("annotation")
        uri_source = spec.get("uri")
        if uri_source:
            uri_file = _expand(uri_source, "", base)
            uris = [u.strip() for u in uri_file.read_text().splitlines() if u.strip()]
        elif annotation_tpl:
            rttm_dir = _expand(annotation_tpl, "*", base)
            uris = sorted(p.stem for p in rttm_dir.parent.glob(rttm_dir.name))

        kept = []
        for uri in uris:
            # locate the wav through the database templates
            wav_src = None
            for tpl in wav_templates or []:
                cand = _expand(tpl, uri, base)
                if cand.exists():
                    wav_src = cand
                    break
            if wav_src is None:
                print(f"[log] - skipping '{uri}': wav not found", flush=True)
                continue
            wav_dst = output / "wav" / f"{uri}.wav"
            if not wav_dst.exists():
                wav_dst.symlink_to(wav_src.resolve())

            if annotation_tpl:
                rttm_src = _expand(annotation_tpl, uri, base)
                if rttm_src.exists():
                    shutil.copy(rttm_src, output / "rttm" / f"{uri}.rttm")
                    annots = [
                        AudioAnnotation.from_rttm(line)
                        for line in rttm_src.read_text().splitlines()
                        if line.strip()
                    ]
                    with (output / "aa" / f"{uri}.aa").open("w") as f:
                        f.writelines(a.write() + "\n" for a in annots)
            uem_tpl = spec.get("annotated")
            if uem_tpl:
                uem_src = _expand(uem_tpl, uri, base)
                if uem_src.exists():
                    shutil.copy(uem_src, output / "uem" / f"{uri}.uem")
            kept.append(uri)

        with (output / f"{split}.txt").open("w") as f:
            f.writelines(u + "\n" for u in kept)
        print(f"[log] - split {split}: {len(kept)} uris", flush=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--database", required=True, help="path to database.yml")
    parser.add_argument(
        "--protocol", default=None, help="Database.Protocol to import"
    )
    parser.add_argument("--out", required=True)
    args = parser.parse_args()
    import_protocol(Path(args.database), args.protocol, Path(args.out))
