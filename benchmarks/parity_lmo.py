"""Turnkey LM-O AR-parity harness: one command from raw data to AR-vs-33.7.

Runs the full pipeline at the published configuration
(reference: configs/{gen_templates,gen_repre,infer}/lmo.json) —

    gen_templates -> gen_repre -> infer -> BOP19 submission -> AR

— and prints the BOP Average Recall next to the reference's reproduced 33.7
(reference README.md:173-181). This is the north-star accuracy check; it
needs only two inputs that do not exist in the build environment (no network
egress): the BOP LM-O dataset and the official DINOv2 ViT-S/14-reg weights.

Usage:
    python benchmarks/parity_lmo.py \
        --bop-root /path/to/bop  \
        --weights /path/to/dinov2_vits14_reg4_pretrain.pth \
        --output-dir /tmp/foundpose_parity \
        [--detections /path/to/cnos-fastsam_lmo.json] \
        [--templates-dir DIR]   # reuse released/previous templates \
        [--repre-dir DIR]       # reuse released/previous repre \
        [--object-lids 1 5 6]   # subset for a quick run

or: make parity BOP_ROOT=... WEIGHTS=... [DETECTIONS=...]

Already-generated stage artifacts are reused (stage-level resume, matching
the reference's artifact-on-disk flow, SURVEY.md §5.4).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_LMO_AR = 33.7  # reference README.md:175-179 (reproduced, ViT-S)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bop-root", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--detections", default="")
    ap.add_argument("--templates-dir", default="")
    ap.add_argument("--repre-dir", default="")
    ap.add_argument("--object-lids", type=int, nargs="*", default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--version", default="parity")
    args = ap.parse_args()

    from foundpose_tpu.pipeline import eval_ar as eval_mod
    from foundpose_tpu.pipeline import gen_repre as gr
    from foundpose_tpu.pipeline import gen_templates as gt
    from foundpose_tpu.pipeline import infer as inf
    from foundpose_tpu.pipeline import prepare_bop_submission as sub

    out = args.output_dir
    templates_dir = args.templates_dir or os.path.join(out, "templates")
    repre_dir = args.repre_dir or os.path.join(out, "repre")
    infer_dir = os.path.join(out, "inference")
    lids = args.object_lids

    # 1. Templates (skipped per object if already rendered).
    tpl_opts = gt.GenTemplatesOpts(
        version=args.version,
        object_dataset="lmo",
        object_lids=lids,
        bop_root=args.bop_root,
        output_dir=templates_dir,
        overwrite=False,
        resume=True,
    )
    gt.synthesize_templates(tpl_opts)

    # 2. Object representations (published setup: PCA 256, 2048 words,
    #    tf-idf k=3 hard assignment; configs/gen_repre/lmo.json).
    rep_opts = gr.GenRepreOpts(
        version=args.version,
        templates_version=args.version,
        object_dataset="lmo",
        object_lids=lids,
        weights_path=args.weights,
        templates_dir=templates_dir,
        output_dir=repre_dir,
        overwrite=False,
        resume=True,
    )
    gr.generate_repre_from_list(rep_opts)

    # 3. Inference (top-5 templates, 300 buddies, RANSAC 400@10px + LM;
    #    configs/infer/lmo.json). CNOS detections if given, GT fallback
    #    otherwise (reference: infer_pose_util.py:140-149).
    infer_opts = inf.InferOpts(
        version=args.version,
        repre_version=args.version,
        object_dataset="lmo",
        object_lids=lids,
        weights_path=args.weights,
        use_detections=bool(args.detections),
        detections_path=args.detections,
        bop_root=args.bop_root,
        repre_dir=repre_dir,
        output_dir=infer_dir,
        batch_size=args.batch_size,
        use_pallas_attention=True,
        resume=True,
    )
    inf.infer(infer_opts)

    # 4. BOP19 submission CSV.
    csv_path = os.path.join(out, "foundposetpu_lmo-test.csv")
    sub.prepare(
        sub.PrepareBopSubmissionOpts(
            object_dataset="lmo",
            version=args.version,
            object_lids=lids,
            results_dir=infer_dir,
            output_path=csv_path,
        )
    )

    # 5. BOP AR.
    metrics = eval_mod.evaluate(
        eval_mod.EvalArOpts(
            object_dataset="lmo",
            submission_path=csv_path,
            bop_root=args.bop_root,
            output_path=os.path.join(out, "ar.json"),
        )
    )
    ar = 100.0 * float(metrics.get("bop_ar", metrics.get("ar", float("nan"))))
    result = {
        "metric": "lmo_bop_ar",
        "value": round(ar, 2),
        "reference": REFERENCE_LMO_AR,
        "ratio_vs_reference": round(ar / REFERENCE_LMO_AR, 4),
        "pass_95pct": bool(ar >= 0.95 * REFERENCE_LMO_AR),
        "submission": csv_path,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
