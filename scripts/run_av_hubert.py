#!/usr/bin/env python
"""Lip-reading evaluation of generated talking-face videos.

Reference-surface parity: talking_face/run_av_hubert.py:34-145 — run AV-HuBERT
inference per generated video (fairseq, user-installed) against the MEAD
transcript list, then score WER/CER and viseme-WER/CER.

Stages (composable):
  1. Inference (--videos GLOB): per video, build the fairseq manifest the
     reference builds (test.tsv: "/\\n test-0<TAB>path<TAB>None<TAB>nframes
     <TAB>16000*nframes/30", test.wrd: "DUMMY") and run AV-HuBERT
     (--av-hubert-ckpt + --user-dir, beam=1, video modality). Hypotheses are
     written to --hyp-json. If fairseq is not importable, the manifests and a
     ready-to-run driver script are emitted to --handoff-dir instead, to be
     executed inside any fairseq environment; it produces the same
     --hyp-json. Hand-off format: {video_name: "HYPOTHESIS TEXT"}.
  2. Scoring (--hyp-json + --transcripts): WER/CER + viseme rates. Transcript
     list format: `subj_lvl_emo_nbr<TAB or space>sentence...` (MEAD
     list_full_mead_annotated.txt). Video names carry subj=/emo=/lvl=/nbr=
     fields like the reference's save_videos output.
"""
import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def mead_key_from_video(video_path: str):
    """subj=M003_emo=happy_lvl=level_1_nbr=001.mp4 -> M003_level_1_happy_001
    (reference run_av_hubert.py:130-137)."""
    name = os.path.basename(video_path)

    def field(key, pat=r"([^_.]+)"):
        m = re.search(rf"{key}=" + pat, name)
        return m.group(1) if m else None

    subj = field("subj")
    emo = field("emo")
    nbr = field("nbr")
    lvl = field("lvl", r"([^_.]+_[^_.]+)")
    if None in (subj, emo, nbr, lvl):
        return os.path.splitext(name)[0]
    return f"{subj}_{lvl}_{emo}_{nbr}"


def count_frames(video_path: str) -> int:
    if video_path.endswith(".pkl"):
        # pkl videos from progressive sampling carry frames directly
        import pickle

        with open(video_path, "rb") as f:
            return len(pickle.load(f)["video"])
    import cv2

    return int(cv2.VideoCapture(video_path).get(cv2.CAP_PROP_FRAME_COUNT))


def write_manifest(data_dir: str, video_path: str, num_frames: int):
    """The exact single-video manifest the reference builds (:62-68)."""
    os.makedirs(data_dir, exist_ok=True)
    with open(os.path.join(data_dir, "test.tsv"), "w") as f:
        f.write("/\n")
        f.write(f"test-0\t{video_path}\t{None}\t{num_frames}"
                f"\t{int(16_000 * num_frames / 30)}\n")
    with open(os.path.join(data_dir, "test.wrd"), "w") as f:
        f.write("DUMMY\n")


def avhubert_infer(videos, ckpt_path: str, user_dir: str) -> dict:
    """In-process fairseq AV-HuBERT inference (reference :34-88).

    Requires fairseq + the av_hubert user dir (external submodule upstream).
    """
    import tempfile
    from argparse import Namespace

    import torch
    from fairseq import checkpoint_utils, tasks, utils
    from fairseq.dataclass.configs import GenerationConfig

    utils.import_user_module(Namespace(user_dir=user_dir))
    gen_cfg = GenerationConfig(beam=1)
    models, saved_cfg, task = checkpoint_utils.load_model_ensemble_and_task(
        [ckpt_path]
    )
    use_cuda = torch.cuda.is_available()
    models = [(m.eval().cuda() if use_cuda else m.eval()) for m in models]
    saved_cfg.task.modalities = ["video"]

    hyps = {}
    for i, video in enumerate(videos):
        data_dir = tempfile.mkdtemp()
        write_manifest(data_dir, video, count_frames(video))
        saved_cfg.task.data = data_dir
        saved_cfg.task.label_dir = data_dir
        task = tasks.setup_task(saved_cfg.task)
        task.load_dataset("test", task_cfg=saved_cfg.task)
        generator = task.build_generator(models, gen_cfg)

        def decode_fn(x):
            dictionary = task.target_dictionary
            ignore = generator.symbols_to_strip_from_output
            ignore.add(dictionary.pad())
            return task.datasets["test"].label_processors[0].decode(x, ignore)

        itr = task.get_batch_iterator(
            dataset=task.dataset("test")
        ).next_epoch_itr(shuffle=False)
        sample = next(itr)
        if use_cuda:
            sample = utils.move_to_cuda(sample)
        hypos = task.inference_step(generator, models, sample)
        hypo = decode_fn(hypos[0][0]["tokens"].int().cpu()).upper()
        hyps[mead_key_from_video(video)] = hypo
        print(f"[{i + 1}/{len(videos)}] {mead_key_from_video(video)}: {hypo}")
    return hyps


def emit_handoff(videos, handoff_dir: str, ckpt_path: str, user_dir: str,
                 hyp_json: str):
    """fairseq unavailable here: write per-video manifests + a driver script
    to run inside a fairseq environment, producing the same --hyp-json."""
    os.makedirs(handoff_dir, exist_ok=True)
    index = []
    for i, video in enumerate(videos):
        d = os.path.join(handoff_dir, f"video_{i:04d}")
        write_manifest(d, os.path.abspath(video), count_frames(video))
        index.append({"manifest_dir": os.path.abspath(d),
                      "video": os.path.abspath(video),
                      "name": mead_key_from_video(video)})
    with open(os.path.join(handoff_dir, "index.json"), "w") as f:
        json.dump({"ckpt": ckpt_path, "user_dir": user_dir,
                   "hyp_json": os.path.abspath(hyp_json),
                   "videos": index}, f, indent=2)
    runner = os.path.join(handoff_dir, "run_in_fairseq_env.py")
    with open(runner, "w") as f:
        f.write(
            "#!/usr/bin/env python\n"
            '"""Run inside a fairseq+av_hubert environment; writes the '
            'hyp-json consumed by scripts/run_av_hubert.py --hyp-json."""\n'
            "import json, os, sys\n"
            f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
            "from scripts.run_av_hubert import avhubert_infer\n"
            f"idx = json.load(open(os.path.join({handoff_dir!r}, 'index.json')))\n"
            "hyps = avhubert_infer([v['video'] for v in idx['videos']],\n"
            "                      idx['ckpt'], idx['user_dir'])\n"
            "json.dump(hyps, open(idx['hyp_json'], 'w'), indent=2)\n"
            "print('wrote', idx['hyp_json'])\n"
        )
    print(f"fairseq not importable here — wrote manifests + driver to "
          f"{handoff_dir}; run {runner} inside a fairseq env")


def load_transcripts(path: str) -> dict:
    """`name sentence...` lines (tab- or space-separated, reference :133)."""
    refs = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                refs[parts[0]] = " ".join(parts[1:])
    return refs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", default=None,
                    help="glob of generated videos for AV-HuBERT inference")
    ap.add_argument("--av-hubert-ckpt",
                    default="external/av_hubert/data/self_large_vox_433h.pt")
    ap.add_argument("--user-dir", default="external/av_hubert/avhubert")
    ap.add_argument("--handoff-dir", default="avhubert_handoff")
    ap.add_argument("--hyp-json", required=True,
                    help="json {video_name: hypothesis transcript} "
                         "(written by inference, read by scoring)")
    ap.add_argument("--transcripts", default=None,
                    help="ground-truth list `name<sep>sentence`")
    ap.add_argument("--visemes", action="store_true",
                    help="also compute viseme-level rates (needs phonemizer)")
    args = ap.parse_args()

    if args.videos:
        videos = sorted(glob.glob(args.videos))
        assert videos, f"no videos match {args.videos}"
        # only the fairseq availability probe sits in try — an ImportError
        # from inside inference (cv2, user-dir modules) must surface, not be
        # misdiagnosed as "fairseq not installed"
        try:
            import fairseq  # noqa: F401

            have_fairseq = True
        except ImportError:
            have_fairseq = False
        if have_fairseq:
            hyps = avhubert_infer(videos, args.av_hubert_ckpt, args.user_dir)
            with open(args.hyp_json, "w") as f:
                json.dump(hyps, f, indent=2)
            print(f"wrote {args.hyp_json}")
        else:
            emit_handoff(videos, args.handoff_dir, args.av_hubert_ckpt,
                         args.user_dir, args.hyp_json)
            if not os.path.exists(args.hyp_json):
                return

    if not args.transcripts:
        return
    from dsml_thesis_tpu.metrics.lipread import (
        cer,
        macro_cer,
        macro_wer,
        wer,
    )

    with open(args.hyp_json) as f:
        hyps = json.load(f)
    refs = load_transcripts(args.transcripts)
    names = sorted(set(hyps) & set(refs))
    if not names:
        print("no overlapping video names between hypotheses and transcripts")
        return
    ref_texts = [refs[n] for n in names]
    hyp_texts = [hyps[n] for n in names]
    print(f"videos scored: {len(names)}")
    # per-video averages = the reference protocol (run_av_hubert.py:104-115);
    # corpus-pooled rates printed alongside for reference-free comparisons
    print(f"WER: {macro_wer(ref_texts, hyp_texts):.4f} "
          f"(corpus {wer(ref_texts, hyp_texts):.4f})")
    print(f"CER: {macro_cer(ref_texts, hyp_texts):.4f} "
          f"(corpus {cer(ref_texts, hyp_texts):.4f})")
    if args.visemes:
        from dsml_thesis_tpu.metrics.lipread import text_to_visemes

        try:
            rv = [text_to_visemes(t) for t in ref_texts]
            hv = [text_to_visemes(t) for t in hyp_texts]
            # viseme text keeps word structure: WERV over viseme-words,
            # CERV over viseme characters (reference :96-103)
            print(f"viseme-WER: {macro_wer(rv, hv):.4f}")
            print(f"viseme-CER: {macro_cer(rv, hv):.4f}")
        except RuntimeError as e:
            print(f"viseme rates skipped: {e}")


if __name__ == "__main__":
    main()
