import numpy as np

from segma_tpu.utils import set_seed


def test_set_seed_smoke():
    set_seed(123)
    a = np.random.rand(3)
    set_seed(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_cli_dispatcher():
    """segma-tpu console dispatcher: help, unknown command, delegation."""
    import pytest as _pytest

    from segma_tpu.cli import _COMMANDS, main

    main([])  # help, no raise
    with _pytest.raises(SystemExit):
        main(["bogus-command"])
    # every mapped module must exist and expose main()
    import importlib

    for mod_name, _ in _COMMANDS.values():
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, "main"))


def test_doctor_healthy_and_mesh(capsys):
    """segma-tpu doctor: all checks pass on a healthy (forced-CPU) box,
    and --config resolves the mesh; exit code reflects health."""
    from pathlib import Path

    import pytest

    from segma_tpu.cli import doctor

    cfg = str(
        Path(__file__).resolve().parent.parent
        / "segma_tpu" / "config" / "default.yml"
    )
    with pytest.raises(SystemExit) as e:
        doctor.main(["--config", cfg])
    out = capsys.readouterr().out
    assert e.value.code == 0
    for check in ("devices", "device probe", "compile cache",
                  "native decoder", "host memory", "mesh"):
        assert f"[ok ] {check}" in out, out
    assert "FAIL" not in out
