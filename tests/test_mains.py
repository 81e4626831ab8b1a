"""Integration tests of the CLI mains, modeled on the reference's strategy
(tests/test_main_*.py — SURVEY.md §4): everything upstream of the optimizer
runs for real (chemistry, Hamiltonian, transforms, pools) and printed pool
sizes are asserted; the expensive optimization is stubbed."""

import pytest

from openvqe_tpu.algorithms.energy_qucc import EnergyUCC as EnergyQUCC
from openvqe_tpu.algorithms.energy_ucc import EnergyUCC


class DummyResult:
    def get_energies(self, *args, **kwargs):
        return (10, -1.137)


def test_main_ucc(monkeypatch, capsys):
    monkeypatch.setattr(EnergyUCC, "get_energies",
                        lambda self, *a, **k: ({}, {}))
    from openvqe_tpu.mains.main_ucc import main
    main()
    out = capsys.readouterr().out
    assert "Running in the non active case:" in out
    assert "Pool size:  36" in out
    assert "length of the cluster OP:  36" in out
    assert "length of the cluster OPS:  36" in out


def test_main_ucc_active_space(monkeypatch, capsys):
    monkeypatch.setattr(EnergyUCC, "get_energies",
                        lambda self, *a, **k: ({}, {}))
    from openvqe_tpu.mains.main_ucc_active_space import main
    main()
    out = capsys.readouterr().out
    assert "Running in the active case:" in out
    assert "Pool size:  18" in out


def test_main_quccsd(monkeypatch, capsys):
    monkeypatch.setattr(EnergyQUCC, "get_energies",
                        lambda self, *a, **k: ({}, {}))
    from openvqe_tpu.mains.main_quccsd import main
    main()
    out = capsys.readouterr().out
    assert "Pool size:  26" in out


def test_main_quccsd_active_space(monkeypatch, capsys):
    monkeypatch.setattr(EnergyQUCC, "get_energies",
                        lambda self, *a, **k: ({}, {}))
    from openvqe_tpu.mains.main_quccsd_active_space import main
    main()
    out = capsys.readouterr().out
    assert "Running in the active case:" in out
    assert "Pool size:  8" in out


def test_main_fermionic_adapt(monkeypatch, capsys):
    calls = []

    def fake_adapt(*args, **kwargs):
        calls.append(1)
        return ({}, {})

    import openvqe_tpu.algorithms.fermionic_adapt as fa
    monkeypatch.setattr(fa, "fermionic_adapt_vqe", fake_adapt)
    from openvqe_tpu.mains.main_fermionic_adapt import main
    main()
    out = capsys.readouterr().out
    assert "Running in the non active case:" in out
    assert "Pool size:  175" in out
    assert "Running in the active case:" in out
    assert "Pool size:  69" in out
    assert len(calls) == 2


def test_main_qubit_adapt(monkeypatch, capsys):
    import openvqe_tpu.algorithms.qubit_adapt as qa
    monkeypatch.setattr(qa, "qubit_adapt_vqe", lambda *a, **k: ({}, {}, {}, {}))
    from openvqe_tpu.mains.main_qubit_adapt import main
    main()
    out = capsys.readouterr().out
    assert "Pool size:  70" in out
    assert "length of the pool 50" in out
