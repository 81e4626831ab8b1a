"""Infrastructure tests: typed config, checkpoint/resume, run logging —
the auxiliary subsystems SURVEY.md §5 flags as absent in the reference."""

import json

import numpy as np
import pytest

from openvqe_tpu.config import VQEConfig
from openvqe_tpu.utils.checkpoint import AdaptState, load_checkpoint, save_checkpoint
from openvqe_tpu.utils.run_logger import RunLogger, read_jsonl


def test_config_roundtrip_and_build():
    cfg = VQEConfig(algorithm="fermionic_adapt", molecule="H4",
                    generator="spin_complement_gsd",
                    max_external_iterations=3, pool_seed=1)
    d = cfg.to_dict()
    cfg2 = VQEConfig.from_dict(d)
    assert cfg2.to_dict() == d
    algo = cfg.build()
    assert type(algo).__name__ == "FermionicAdapt"
    assert cfg.to_opts()["max_external_iterations"] == 3


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck.json")
    st = AdaptState(n_iter=3, op_indices=[5, 1], parameters=[0.1, -0.2],
                    prev_norm=0.5, last_energy=-1.23,
                    iterations={"energies": [-1.0, -1.1]})
    save_checkpoint(path, st)
    st2 = load_checkpoint(path)
    assert st2.n_iter == 3 and st2.op_indices == [5, 1]
    assert st2.iterations["energies"] == [-1.0, -1.1]
    assert load_checkpoint(str(tmp_path / "missing.json")) is None


def test_run_logger(tmp_path):
    path = str(tmp_path / "run.jsonl")
    lg = RunLogger(path)
    lg.log({"iteration": 0, "energy": -1.0})
    lg.log({"note": "done"}, kind="final")
    recs = read_jsonl(path)
    assert len(recs) == 2
    assert recs[0]["kind"] == "iteration" and recs[0]["energy"] == -1.0
    assert recs[1]["kind"] == "final"


def test_adapt_checkpoint_resume(tmp_path):
    """Run 3 ADAPT iterations, then resume for 3 more: the resumed run must
    continue from (not repeat) the first run's ansatz."""
    from openvqe_tpu.vqe import VQE
    ck = str(tmp_path / "adapt_ck.json")
    algo1 = VQE.algorithm("fermionic_adapt", "H4", "spin_complement_gsd",
                          "JW", False,
                          {"max_external_iterations": 3,
                           "checkpoint_path": ck,
                           "log_path": str(tmp_path / "run.jsonl")})
    it1, res1 = algo1.execute()
    assert len(it1["energies"]) == 3

    algo2 = VQE.algorithm("fermionic_adapt", "H4", "spin_complement_gsd",
                          "JW", False,
                          {"max_external_iterations": 6,
                           "checkpoint_path": ck})
    it2, res2 = algo2.execute()
    # resumed run: first 3 records inherited from run 1, continued to 6
    assert len(it2["energies"]) == 6
    assert it2["energies"][:3] == it1["energies"]
    assert it2["energies"][-1] <= it1["energies"][-1] + 1e-12

    recs = read_jsonl(str(tmp_path / "run.jsonl"))
    assert len(recs) == 3 and recs[0]["iteration"] == 0
