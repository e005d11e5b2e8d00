"""Multi-host dataset sharding (parallel/host_shard.py; SURVEY §5.8c).

The reference is single-process, so there is no behavior to mirror; these
tests pin the contract our multi-host story depends on: deterministic,
disjoint, balanced key partitions; shard-suffixed artifact names; and the
submission prep merging shard files back into one BOP19 CSV.
"""

import json
import os

import numpy as np
import pytest

from foundpose_tpu.parallel import host_shard
from foundpose_tpu.pipeline import prepare_bop_submission as sub_mod


@pytest.mark.parametrize("n,count", [(0, 3), (1, 2), (7, 3), (100, 8), (5, 5), (3, 8)])
def test_shard_keys_partition_properties(n, count):
    keys = [(s, i) for s in range(2) for i in range(n)][:n]
    shards = [host_shard.shard_keys(keys, idx, count) for idx in range(count)]
    merged = [k for s in shards for k in s]
    # Union == full list, no key lost or duplicated.
    assert sorted(merged) == sorted(keys)
    assert len(merged) == len(keys)
    # Balanced to within one key (round-robin).
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    # Deterministic.
    assert shards[0] == host_shard.shard_keys(keys, 0, count)


def test_shard_keys_unsharded_is_identity():
    keys = [3, 1, 2]
    assert host_shard.shard_keys(keys, 0, 1) == keys


def test_resolve_shard_validation():
    assert host_shard.resolve_shard(2, 5) == (2, 5)
    with pytest.raises(ValueError):
        host_shard.resolve_shard(5, 5)
    with pytest.raises(ValueError):
        host_shard.resolve_shard(-1, 5)
    with pytest.raises(ValueError):
        host_shard.resolve_shard(0, -2)


def test_resolve_shard_auto_from_jax_runtime():
    # Single-process runtime -> (0, 1); the auto path must not require flags.
    import jax

    assert host_shard.resolve_shard(0, 0) == (
        jax.process_index(),
        jax.process_count(),
    )
    # Explicit index + auto count is a contradiction (a launcher passing
    # shard_index=$TASK_ID but forgetting the count would otherwise have
    # every task silently process the FULL dataset).
    with pytest.raises(ValueError):
        host_shard.resolve_shard(3, 0)


def test_sharded_name():
    assert host_shard.sharded_name("estimated-poses.json", 0, 1) == (
        "estimated-poses.json"
    )
    assert host_shard.sharded_name("estimated-poses.json", 2, 4) == (
        "estimated-poses_shard2of4.json"
    )
    assert host_shard.sharded_name("metrics.tsv", 1, 2) == "metrics_shard1of2.tsv"


def _record(scene_id, img_id, obj_id):
    return {
        "scene_id": scene_id,
        "img_id": img_id,
        "obj_id": obj_id,
        "score": 0.5,
        "R": np.eye(3).tolist(),
        "t": [0.0, 0.0, 100.0],
        "time": {"total": 0.01},
        "cnos_time": 0.0,
    }


def test_load_object_estimates_merges_shards(tmp_path):
    obj_dir = tmp_path / "1"
    obj_dir.mkdir()
    (obj_dir / "estimated-poses_shard0of2.json").write_text(
        json.dumps([_record(1, 0, 1)])
    )
    (obj_dir / "estimated-poses_shard1of2.json").write_text(
        json.dumps([_record(1, 1, 1), _record(2, 0, 1)])
    )
    records, paths = host_shard.load_object_estimates(str(obj_dir))
    assert len(paths) == 2
    assert sorted((r["scene_id"], r["img_id"]) for r in records) == [
        (1, 0),
        (1, 1),
        (2, 0),
    ]
    # Missing directory -> empty, not an error.
    assert host_shard.load_object_estimates(str(tmp_path / "nope")) == ([], [])


def test_load_object_estimates_rejects_stale_artifact_mixes(tmp_path):
    """Stale-artifact layouts that would silently corrupt a submission must
    raise instead of merging: unsharded + sharded coexisting (poses counted
    twice), mixed shard_counts (re-run with a different layout), and an
    incomplete shard set (crashed shard -> silently missing images)."""
    # Unsharded + shard files coexist.
    d1 = tmp_path / "a"
    d1.mkdir()
    (d1 / "estimated-poses.json").write_text(json.dumps([_record(1, 0, 1)]))
    (d1 / "estimated-poses_shard0of2.json").write_text(
        json.dumps([_record(1, 0, 1)])
    )
    with pytest.raises(ValueError, match="BOTH"):
        host_shard.load_object_estimates(str(d1))

    # Mixed shard_counts.
    d2 = tmp_path / "b"
    d2.mkdir()
    (d2 / "estimated-poses_shard0of2.json").write_text("[]")
    (d2 / "estimated-poses_shard0of4.json").write_text("[]")
    with pytest.raises(ValueError, match="different shard_counts"):
        host_shard.load_object_estimates(str(d2))

    # Incomplete shard set (shard 1 of 2 never finished).
    d3 = tmp_path / "c"
    d3.mkdir()
    (d3 / "estimated-poses_shard0of2.json").write_text(
        json.dumps([_record(1, 0, 1)])
    )
    with pytest.raises(ValueError, match="missing shards \\[1\\]"):
        host_shard.load_object_estimates(str(d3))


def test_prepare_submission_merges_sharded_and_unsharded_objects(tmp_path):
    """Object 1 was produced by a 2-shard run, object 2 by an unsharded run;
    one prepare() call flattens both into the BOP19 CSV."""
    base = tmp_path / "demo" / "v1"
    (base / "1").mkdir(parents=True)
    (base / "2").mkdir(parents=True)
    (base / "1" / "estimated-poses_shard0of2.json").write_text(
        json.dumps([_record(1, 0, 1)])
    )
    (base / "1" / "estimated-poses_shard1of2.json").write_text(
        json.dumps([_record(1, 1, 1)])
    )
    (base / "2" / "estimated-poses.json").write_text(
        json.dumps([_record(1, 0, 2)])
    )

    csv_path = sub_mod.prepare(
        sub_mod.PrepareBopSubmissionOpts(
            object_dataset="demo",
            version="v1",
            results_dir=str(tmp_path),
        )
    )
    lines = open(csv_path).read().strip().split("\n")
    assert lines[0] == "scene_id,im_id,obj_id,score,R,t,time"
    rows = {tuple(l.split(",")[:3]) for l in lines[1:]}
    assert rows == {("1", "0", "1"), ("1", "1", "1"), ("1", "0", "2")}


def test_gen_stages_shard_by_object(tmp_path):
    """The offline stages shard the OBJECT list: a shard that holds none of
    the requested objects completes without rendering or reading any model
    (its objects' artifacts belong to the other shard)."""
    from foundpose_tpu.pipeline import gen_templates as gt

    bop_root = tmp_path / "bop"
    (bop_root / "demo" / "models").mkdir(parents=True)
    (bop_root / "demo" / "models" / "models_info.json").write_text(
        json.dumps({"1": {"diameter": 80.0}})
    )
    out = tmp_path / "templates"
    # Object 1 is index 0 -> shard 0 of 2; shard 1 must no-op (no model PLY
    # exists, so actually processing it would raise).
    gt.synthesize_templates(
        gt.GenTemplatesOpts(
            object_dataset="demo",
            object_lids=[1],
            shard_index=1,
            shard_count=2,
            bop_root=str(bop_root),
            output_dir=str(out),
        )
    )
    assert not (out / "demo" / "v1" / "1").exists()


def test_prepare_submission_missing_object_raises(tmp_path):
    base = tmp_path / "demo" / "v1" / "3"
    base.mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        sub_mod.prepare(
            sub_mod.PrepareBopSubmissionOpts(
                object_dataset="demo", version="v1", results_dir=str(tmp_path)
            )
        )
