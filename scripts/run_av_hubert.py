#!/usr/bin/env python
"""Lip-reading evaluation of generated talking-face videos.

Reference-surface parity: talking_face/run_av_hubert.py:34-145 — run AV-HuBERT
inference per generated video (external fairseq tool, user-installed) against
the MEAD transcript list, then score WER/CER and viseme-WER/CER.

This wrapper separates the two stages so the scoring half works standalone:
  1. --hyp-json: {video_name: hypothesis_text} produced by any lip-reading
     tool (the reference's AV-HuBERT checkpoint, or anything else).
  2. --transcripts: MEAD annotation list `name<TAB>sentence`.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dsml_thesis_tpu.metrics.lipread import cer, wer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hyp-json", required=True,
                    help="json {video_name: hypothesis transcript}")
    ap.add_argument("--transcripts", required=True,
                    help="tsv of ground-truth `name<TAB>sentence`")
    ap.add_argument("--visemes", action="store_true",
                    help="also compute viseme-level rates (needs phonemizer)")
    args = ap.parse_args()

    with open(args.hyp_json) as f:
        hyps = json.load(f)
    refs = {}
    with open(args.transcripts) as f:
        for line in f:
            if not line.strip():
                continue
            name, _, sent = line.strip().partition("\t")
            refs[name] = sent

    names = sorted(set(hyps) & set(refs))
    if not names:
        print("no overlapping video names between hypotheses and transcripts")
        return
    ref_texts = [refs[n] for n in names]
    hyp_texts = [hyps[n] for n in names]
    print(f"videos scored: {len(names)}")
    print(f"WER: {wer(ref_texts, hyp_texts):.4f}")
    print(f"CER: {cer(ref_texts, hyp_texts):.4f}")
    if args.visemes:
        from dsml_thesis_tpu.metrics.lipread import text_to_visemes, error_rate

        rv = [text_to_visemes(t) for t in ref_texts]
        hv = [text_to_visemes(t) for t in hyp_texts]
        print(f"viseme-WER: {error_rate(rv, hv):.4f}")


if __name__ == "__main__":
    main()
