"""Offline paraphrase-cache generator for grounding text augmentation.

Counterpart of reference `wsdm2023/tools/paraphrase.py` (Parrot T5 on GPU):
reads the WSDM-style CSV (columns `image`, `question`), produces a JSON cache
consumed by `vitadapter.data.grounding.ParaphraseCache` at train time.

Two generation backends:
  * `--model <hf-id>` — a seq2seq paraphraser via transformers (e.g. the
    Parrot T5 checkpoint the reference uses). Needs the weights locally
    (no egress in the build environment).
  * rule-based fallback (default when the model can't be loaded) — cheap
    deterministic question rewrites (aux-fronting templates, article and
    punctuation normalization). These preserve meaning, which is all the
    `RandomParaPhrase`-style augmentation requires.

The cache is keyed by the normalized question text (what
`ParaphraseCache.maybe_paraphrase` looks up); pass `--key image` for the
reference's image-name keying.
"""

import argparse
import csv
import json


def normalize(q: str) -> str:
    return q.replace('"', "").replace("?", "").strip().lower()


_WH = ("what", "where", "which", "who", "whose", "how many", "how")


def rule_paraphrases(phrase: str, topn: int) -> list:
    """Deterministic meaning-preserving rewrites of a grounding question."""
    out = []
    words = phrase.split()
    if not words:
        return [phrase]
    # "what is the X ..." -> "the X ...", "find the X ..."
    lowered = " ".join(words)
    for wh in _WH:
        if lowered.startswith(wh + " is ") or lowered.startswith(wh + " are "):
            rest = " ".join(words[2:])
            out.extend([rest, "find " + rest, "point to " + rest])
            break
        if lowered.startswith(wh + " "):
            rest = " ".join(words[1:])
            out.extend(["find " + rest, rest])
            break
    else:
        out.extend(["find " + lowered, "where is " + lowered])
    # article swap a/the (grounding targets are definite)
    if words[0] in ("a", "an"):
        out.append(" ".join(["the"] + words[1:]))
    seen, uniq = set(), []
    for p in out:
        p = p.strip()
        if p and p != phrase and p not in seen:
            seen.add(p)
            uniq.append(p)
    return (uniq or [phrase])[:topn]


def load_model(tag: str):
    from transformers import AutoModelForSeq2SeqLM, AutoTokenizer
    tok = AutoTokenizer.from_pretrained(tag)
    model = AutoModelForSeq2SeqLM.from_pretrained(tag)
    return tok, model


def model_paraphrases(tok, model, phrase: str, topn: int) -> list:
    import torch
    ids = tok("paraphrase: " + phrase, return_tensors="pt",
              truncation=True, max_length=128)
    with torch.no_grad():
        gen = model.generate(**ids, num_beams=max(4, topn),
                             num_return_sequences=topn, max_length=64)
    outs = [tok.decode(g, skip_special_tokens=True) for g in gen]
    return [normalize(o) for o in outs if normalize(o)] or [phrase]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csv", help="csv with `image`,`question` columns")
    ap.add_argument("out", help="output json cache path")
    ap.add_argument("--topn", type=int, default=3)
    ap.add_argument("--model", default=None,
                    help="HF seq2seq paraphraser id (local weights); "
                         "falls back to rule-based rewrites if unavailable")
    ap.add_argument("--key", choices=("question", "image"),
                    default="question")
    args = ap.parse_args()

    tok = model = None
    if args.model:
        try:
            tok, model = load_model(args.model)
            print(f"loaded paraphrase model {args.model}")
        except Exception as e:  # no weights offline -> rule-based
            print(f"model unavailable ({e}); using rule-based rewrites")

    res = {}
    with open(args.csv) as f:
        rows = list(csv.DictReader(f))
    for i, row in enumerate(rows):
        phrase = normalize(row["question"])
        if model is not None:
            paras = model_paraphrases(tok, model, phrase, args.topn)
        else:
            paras = rule_paraphrases(phrase, args.topn)
        key = (row["image"].split("/")[-1] if args.key == "image"
               else phrase)
        res[key] = paras
        if (i + 1) % 200 == 0:
            print(f"[{i + 1}/{len(rows)}]")
    with open(args.out, "w") as f:
        json.dump(res, f)
    print(f"wrote {len(res)} entries -> {args.out}")


if __name__ == "__main__":
    main()
