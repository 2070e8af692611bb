"""MMMU benchmark harness.

Compact reimplementation of the reference's vendored MMMU harness
(llava/eval/mmmu/eval/: run_llava.py, eval_utils parsing, main_eval_only,
print_results — ~1k LoC): loads the MMMU HF dataset (30 subjects), builds
multiple-choice / open prompts, parses responses into option letters or
normalized open answers, and scores per subject and overall.

Usage:
  python -m tokenpacker_tpu.eval.mmmu run   --model-path ... --output answers.json
  python -m tokenpacker_tpu.eval.mmmu score --answers answers.json --answer-dict answer_dict_val.json
"""

from __future__ import annotations

import argparse
import ast
import json
import random
import re
import string

SUBJECTS = [
    "Accounting", "Agriculture", "Architecture_and_Engineering", "Art", "Art_Theory",
    "Basic_Medical_Science", "Biology", "Chemistry", "Clinical_Medicine", "Computer_Science",
    "Design", "Diagnostics_and_Laboratory_Medicine", "Economics", "Electronics",
    "Energy_and_Power", "Finance", "Geography", "History", "Literature", "Manage",
    "Marketing", "Materials", "Math", "Mechanical_Engineering", "Music", "Pharmacy",
    "Physics", "Psychology", "Public_Health", "Sociology",
]

MC_PROMPT = "Answer with the option's letter from the given choices directly."
OPEN_PROMPT = "Answer the question using a single word or phrase."


def build_prompt(sample: dict) -> tuple[str, list[str]]:
    """Returns (prompt_text, option_letters). Image placeholders <image 1>
    etc. collapse to a single leading <image> (single-image subset, as the
    reference's llava1.5 config does)."""
    question = re.sub(r"<image \d+>", "", sample["question"]).strip()
    if sample["question_type"] == "multiple-choice":
        options = sample["options"]
        if isinstance(options, str):
            options = ast.literal_eval(options)
        letters = list(string.ascii_uppercase[: len(options)])
        lines = [question] + [f"{l}. {o}" for l, o in zip(letters, options)] + [MC_PROMPT]
        return "\n".join(lines), letters
    return f"{question}\n{OPEN_PROMPT}", []


def parse_multi_choice_response(response: str, all_choices: list[str], index2ans: dict) -> str:
    """Reference eval_utils.parse_multi_choice_response behavior: look for a
    bracketed/bare option letter, then for option text; random fallback."""
    response = response.strip()
    for char in [",", ".", "!", "?", ";", ":", "'"]:
        response = response.strip(char)
    response = " " + response + " "

    candidates = []
    for choice in all_choices:  # (A) or A) style
        if f"({choice})" in response or f"{choice})" in response:
            candidates.append(choice)
    if not candidates:
        for choice in all_choices:  # bare letter with spaces
            if f" {choice} " in response:
                candidates.append(choice)
    if not candidates and len(response) > 5:  # match option text
        for idx, ans in index2ans.items():
            if ans and ans.lower() in response.lower():
                candidates.append(idx)
    if not candidates:
        return random.Random(0).choice(all_choices)
    if len(candidates) > 1:
        # pick the last occurrence (reference behavior)
        starts = []
        for c in candidates:
            for pat in (f"({c})", f"{c})", f" {c} "):
                pos = response.rfind(pat)
                if pos != -1:
                    starts.append((pos, c))
                    break
        candidates = [max(starts)[1]] if starts else candidates[:1]
    return candidates[0]


def _norm_open(ans: str) -> str:
    return ans.strip().lower().strip(".")


def parse_open_response(response: str) -> list[str]:
    """Simplified eval_utils.parse_open_response: the final sentence plus
    extracted numbers, normalized."""
    response = response.strip()
    sentences = re.split(r"(?<=[.!?])\s+", response)
    key = sentences[-1] if sentences else response
    outs = {_norm_open(key), _norm_open(response)}
    outs.update(re.findall(r"-?\d+(?:\.\d+)?", response))
    return [o for o in outs if o]


def eval_answer(sample_type: str, gold, pred) -> bool:
    if sample_type == "multiple-choice":
        return pred == gold
    golds = gold if isinstance(gold, list) else [gold]
    preds = parse_open_response(pred) if isinstance(pred, str) else [pred]
    for g in golds:
        gn = _norm_open(str(g))
        for p in preds:
            if gn == _norm_open(str(p)):
                return True
    return False


def score_answers(answers: dict, answer_dict: dict) -> dict:
    """answers: qid → parsed prediction; answer_dict: qid →
    {'ground_truth', 'question_type'}. Per-subject + overall accuracy."""
    per_subject: dict[str, list[bool]] = {}
    for qid, pred in answers.items():
        meta = answer_dict.get(qid)
        if meta is None:
            continue
        subject = "_".join(qid.split("_")[1:-1])
        ok = eval_answer(meta["question_type"], meta["ground_truth"], pred)
        per_subject.setdefault(subject, []).append(ok)
    out = {}
    all_flat = []
    for s, v in sorted(per_subject.items()):
        out[s] = {"num": len(v), "acc": sum(v) / len(v)}
        all_flat.extend(v)
    out["Overall"] = {
        "num": len(all_flat),
        "acc": sum(all_flat) / max(len(all_flat), 1),
    }
    return out


def run(args):
    from datasets import concatenate_datasets, load_dataset

    from tokenpacker_tpu.api import load_pretrained_model
    from tokenpacker_tpu.eval.runner import EvalRunner, EvalSample

    tokenizer, model, _, _ = load_pretrained_model(args.model_path, args.model_base)
    runner = EvalRunner(model, tokenizer, conv_mode=args.conv_mode, batch_size=args.batch_size)

    subs = []
    for subject in SUBJECTS:
        subs.append(load_dataset(args.data_path, subject, split=args.split))
    dataset = concatenate_datasets(subs)
    if getattr(args, "num_chunks", 1) > 1:
        # shell fan-out parity (reference scripts/v1_5/eval/mmmu_val.sh)
        dataset = dataset.select(
            range(args.chunk_idx, len(dataset), args.num_chunks)
        )

    metas = {}

    def samples():
        for rec in dataset:
            prompt, letters = build_prompt(rec)
            options = rec["options"]
            if isinstance(options, str):
                options = ast.literal_eval(options)
            metas[rec["id"]] = (rec["question_type"], letters,
                                {l: o for l, o in zip(letters, options)} if letters else {})
            yield EvalSample(question_id=rec["id"], prompt_text=prompt, image=rec["image_1"])

    parsed = {}
    for ans in runner.run(samples()):
        qtype, letters, index2ans = metas[ans["question_id"]]
        if qtype == "multiple-choice":
            parsed[ans["question_id"]] = parse_multi_choice_response(
                ans["text"], letters, index2ans
            )
        else:
            parsed[ans["question_id"]] = ans["text"]
    with open(args.output, "w") as f:
        json.dump(parsed, f, indent=2)


def score(args):
    with open(args.answers) as f:
        answers = json.load(f)
    with open(args.answer_dict) as f:
        answer_dict = json.load(f)
    results = score_answers(answers, answer_dict)
    print(json.dumps(results, indent=2))


def main(argv=None):
    from tokenpacker_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("run")
    sp.add_argument("--model-path", required=True)
    sp.add_argument("--model-base", default=None)
    sp.add_argument("--data-path", default="MMMU/MMMU")
    sp.add_argument("--split", default="validation")
    sp.add_argument("--conv-mode", default="vicuna_v1")
    sp.add_argument("--batch-size", type=int, default=8)
    sp.add_argument("--num-chunks", type=int, default=1)
    sp.add_argument("--chunk-idx", type=int, default=0)
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=run)
    sp = sub.add_parser("score")
    sp.add_argument("--answers", required=True)
    sp.add_argument("--answer-dict", required=True)
    sp.set_defaults(fn=score)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
