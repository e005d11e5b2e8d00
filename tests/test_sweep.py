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
