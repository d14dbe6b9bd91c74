"""Multi-model artifact bundles: one directory, several frozen models.

A *bundle* is a directory whose immediate subdirectories are exported
artifact dirs (``segma_tpu.export.export_inference`` output), plus a
``bundle.json`` manifest naming them and electing a default. One server
process (``segma-tpu serve --bundle``) then exposes every model behind a
single port, selected per request with ``?model=<name>`` — the deployment
shape for serving e.g. a VAD model and a speaker-type model side by side,
or a canary next to the production version.

The reference has no deployment packaging at all (inference requires the
full torch stack + checkpoint, ``/root/reference/src/segma/inference.py:
398-440``); bundles extend this repo's single-artifact export into a
versioned multi-model catalog.

Layout::

    bundle.json            {"format_version", "default", "models": {...}}
    <name>/manifest.json   per-model artifact (export.py layout)
    <name>/infer_*.jaxexp
    ...

``bundle.json`` is derived metadata: ``write_bundle_manifest`` rebuilds it
from the subdirectories at any time, and ``load_bundle`` synthesizes it in
memory when the file is absent (a bare directory of artifacts is already a
valid bundle).
"""

from __future__ import annotations

import json
from pathlib import Path

BUNDLE_VERSION = 1

#: per-model manifest fields surfaced into bundle.json / GET /v1/models —
#: the catalog view of an artifact (geometry/programs stay in the artifact)
_CATALOG_FIELDS = (
    "model_name",
    "labels",
    "sample_rate",
    "transport",
    "framework_version",
    "model_version",
    "created_at",
    "format_version",
    "streaming",
)


def _discover(bundle_dir: Path) -> dict[str, dict]:
    """Map subdirectory name -> catalog entry for every artifact inside."""
    models: dict[str, dict] = {}
    for sub in sorted(p for p in bundle_dir.iterdir() if p.is_dir()):
        mf = sub / "manifest.json"
        if not mf.is_file():
            continue
        manifest = json.loads(mf.read_text())
        entry = {k: manifest.get(k) for k in _CATALOG_FIELDS}
        entry["path"] = sub.name
        models[sub.name] = entry
    if not models:
        raise FileNotFoundError(
            f"no artifact directories (containing manifest.json) under "
            f"{bundle_dir}"
        )
    return models


def _elect_default(models: dict[str, dict], default: str | None) -> str:
    if default is not None:
        if default not in models:
            raise KeyError(
                f"default model {default!r} not in bundle "
                f"(have: {sorted(models)})"
            )
        return default
    if len(models) == 1:
        return next(iter(models))
    raise ValueError(
        f"bundle holds {len(models)} models ({sorted(models)}); pick the "
        "default explicitly (--default / bundle.json 'default')"
    )


def write_bundle_manifest(
    bundle_dir: Path | str, default: str | None = None
) -> Path:
    """Scan ``bundle_dir`` for artifacts and (re)write ``bundle.json``.

    ``default`` keeps an existing election when re-scanning unless
    overridden; a single-model bundle elects itself.
    """
    bundle_dir = Path(bundle_dir)
    models = _discover(bundle_dir)
    out = bundle_dir / "bundle.json"
    if default is None and out.is_file():
        prior = json.loads(out.read_text()).get("default")
        if prior in models:
            default = prior
    manifest = {
        "format_version": BUNDLE_VERSION,
        "default": _elect_default(models, default),
        "models": models,
    }
    out.write_text(json.dumps(manifest, indent=2))
    return out


def load_bundle(
    bundle_dir: Path | str, default: str | None = None
) -> tuple[dict, dict]:
    """Load every artifact in a bundle.

    Returns ``(manifest, pipelines)`` where ``pipelines`` maps model name
    -> :class:`segma_tpu.export.ExportedPipeline`. ``bundle.json`` is used
    when present (its ``default`` election and model listing win); a bare
    directory of artifact subdirs loads without one. ``default`` overrides
    the election either way.
    """
    from segma_tpu.export import ExportedPipeline

    bundle_dir = Path(bundle_dir)
    bf = bundle_dir / "bundle.json"
    if bf.is_file():
        manifest = json.loads(bf.read_text())
        if manifest.get("format_version", 1) > BUNDLE_VERSION:
            raise ValueError(
                f"bundle format {manifest['format_version']} is newer than "
                f"this build ({BUNDLE_VERSION})"
            )
        models = manifest["models"]
        if default is not None:
            manifest["default"] = _elect_default(models, default)
    else:
        models = _discover(bundle_dir)
        manifest = {
            "format_version": BUNDLE_VERSION,
            "default": _elect_default(models, default),
            "models": models,
        }
    pipelines = {
        name: ExportedPipeline.load(bundle_dir / entry["path"])
        for name, entry in models.items()
    }
    if manifest["default"] not in pipelines:
        raise KeyError(
            f"bundle.json default {manifest['default']!r} has no artifact "
            f"directory (have: {sorted(pipelines)})"
        )
    return manifest, pipelines
