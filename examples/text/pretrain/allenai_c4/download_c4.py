# Download allenai/c4 (en) and convert to {"text": ...} jsonl files that
# stage 0 of run.sh shards into TouchDataset format.
# Parity: reference examples/text/pretrain/allenai_c4/download_c4.py.
import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", default="data/jsonl")
    p.add_argument("--name", default="en")
    p.add_argument("--splits", nargs="*", default=["train", "validation"])
    p.add_argument("--shard_lines", type=int, default=200000)
    args = p.parse_args()
    try:
        from datasets import load_dataset  # optional dep, network required
    except ImportError as e:
        raise SystemExit(
            "`datasets` is not installed; provide your own jsonl of "
            '{"text": ...} lines instead'
        ) from e
    os.makedirs(args.output_dir, exist_ok=True)
    for split in args.splits:
        ds = load_dataset("allenai/c4", args.name, split=split, streaming=True)
        shard, n, f = 0, 0, None
        for rec in ds:
            if f is None:
                f = open(os.path.join(
                    args.output_dir, f"{split}-{shard:05d}.jsonl"), "w")
            f.write(json.dumps({"text": rec["text"]}, ensure_ascii=False) + "\n")
            n += 1
            if n % args.shard_lines == 0:
                f.close()
                f = None
                shard += 1
        if f:
            f.close()


if __name__ == "__main__":
    main()
