import json
import os

import numpy as np

from foundpose_tpu.pipeline import sweep as sweep_mod


def test_sweep_runs_all_datasets(tmp_path, monkeypatch):
    calls = []

    def fake_infer(opts):
        calls.append(opts.object_dataset)
        out = os.path.join(opts.output_dir, opts.object_dataset, opts.version, "1")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "estimated-poses.json"), "w") as f:
            json.dump(
                [
                    {
                        "scene_id": "1", "img_id": "0", "obj_id": "1",
                        "inst_id": "0", "hypothesis_id": "0", "score": "0.5",
                        "R": np.eye(3).tolist(), "t": [[0.0], [0.0], [1.0]],
                        "time": {"pipeline": 0.01}, "cnos_time": 0.1,
                    }
                ],
                f,
            )

    monkeypatch.setattr(sweep_mod.infer_mod, "infer", fake_infer)
    opts = sweep_mod.SweepOpts(
        datasets=["lmo", "tudl"],
        output_dir=str(tmp_path),
        detections_dir=str(tmp_path),
        bop_root=str(tmp_path),
        repre_dir=str(tmp_path),
    )
    out = sweep_mod.sweep(opts)
    assert calls == ["lmo", "tudl"]
    for ds, csv in out.items():
        assert os.path.exists(csv)
        lines = open(csv).read().strip().split("\n")
        assert lines[0].startswith("scene_id,")
        assert len(lines) == 2


def test_sweep_shard_semantics(tmp_path, monkeypatch):
    """shard_count=0 (auto) on a single-process runtime resolves to an
    UNSHARDED run and must still produce the CSV; an explicitly sharded run
    defers the CSV to a post-merge prepare_bop_submission."""

    def fake_infer(opts):
        out = os.path.join(opts.output_dir, opts.object_dataset, opts.version, "1")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "estimated-poses.json"), "w") as f:
            json.dump(
                [
                    {
                        "scene_id": "1", "img_id": "0", "obj_id": "1",
                        "score": "0.5", "R": np.eye(3).tolist(),
                        "t": [[0.0], [0.0], [1.0]],
                        "time": {"pipeline": 0.01}, "cnos_time": 0.1,
                    }
                ],
                f,
            )

    monkeypatch.setattr(sweep_mod.infer_mod, "infer", fake_infer)
    base = dict(
        datasets=["lmo"],
        detections_dir=str(tmp_path),
        bop_root=str(tmp_path),
        repre_dir=str(tmp_path),
    )
    # Auto on one process -> resolved (0, 1) -> CSV written.
    out_auto = sweep_mod.sweep(
        sweep_mod.SweepOpts(
            output_dir=str(tmp_path / "auto"), shard_count=0, **base
        )
    )
    assert out_auto["lmo"].endswith(".csv") and os.path.exists(out_auto["lmo"])
    # Explicit 2-shard run -> CSV deferred, results dir returned instead.
    out_sharded = sweep_mod.sweep(
        sweep_mod.SweepOpts(
            output_dir=str(tmp_path / "sharded"),
            shard_index=0,
            shard_count=2,
            **base,
        )
    )
    assert not out_sharded["lmo"].endswith(".csv")
    assert os.path.isdir(out_sharded["lmo"])
