"""pyannote-database importer tests (scripts/load_data.py)."""

import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from segma_tpu.annotation import AudioAnnotation
from segma_tpu.utils.io import write_data_to_disk


@pytest.fixture
def pyannote_db(tmp_path):
    base = tmp_path / "db"
    (base / "wavs").mkdir(parents=True)
    (base / "rttms").mkdir()
    (base / "uems").mkdir()
    for uri in ("f1", "f2", "f3"):
        write_data_to_disk(np.zeros((1, 16_000), np.float32), base / "wavs" / uri)
        (base / "rttms" / f"{uri}.rttm").write_text(
            AudioAnnotation(uri, 0.1, 0.3, "KCHI").to_rttm() + "\n"
        )
        (base / "uems" / f"{uri}.uem").write_text(f"{uri} NA 0.0 1.0\n")
    (base / "train_uris.txt").write_text("f1\nf2\n")
    (base / "dev_uris.txt").write_text("f3\n")
    db = {
        "Databases": {"MyDB": "wavs/{uri}.wav"},
        "Protocols": {
            "MyDB": {
                "SpeakerDiarization": {
                    "proto": {
                        "train": {
                            "uri": "train_uris.txt",
                            "annotation": "rttms/{uri}.rttm",
                            "annotated": "uems/{uri}.uem",
                        },
                        "development": {
                            "uri": "dev_uris.txt",
                            "annotation": "rttms/{uri}.rttm",
                            "annotated": "uems/{uri}.uem",
                        },
                    }
                }
            }
        },
    }
    (base / "database.yml").write_text(yaml.dump(db))
    return base


def test_import_protocol(pyannote_db, tmp_path):
    from load_data import import_protocol

    out = tmp_path / "imported"
    import_protocol(pyannote_db / "database.yml", "MyDB.proto", out)

    assert (out / "train.txt").read_text().split() == ["f1", "f2"]
    assert (out / "val.txt").read_text().split() == ["f3"]
    # wav symlinks resolve
    assert (out / "wav" / "f1.wav").resolve().exists()
    # rttm copied, aa converted
    assert (out / "rttm" / "f1.rttm").exists()
    aa = (out / "aa" / "f1.aa").read_text().strip()
    assert aa == "f1 0.1 0.3 KCHI"
    assert (out / "uem" / "f3.uem").exists()


def test_import_skips_missing_wavs(pyannote_db, tmp_path, capsys):
    from load_data import import_protocol

    (pyannote_db / "train_uris.txt").write_text("f1\nmissing_uri\n")
    out = tmp_path / "imported2"
    import_protocol(pyannote_db / "database.yml", "MyDB.proto", out)
    assert (out / "train.txt").read_text().split() == ["f1"]
    assert "missing_uri" in capsys.readouterr().out
