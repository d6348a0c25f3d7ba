"""Config-driven benchmark automation (reference:
neuralmagic/benchmarks/run_benchmarks.py — JSON configs spawning
serving/throughput benchmark scripts, results logged as JSON).
"""
import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).parent


def run_one(script: str, script_args: dict, output_dir: Path,
            tag: str) -> dict:
    cmd = [sys.executable, str(HERE / script)]
    for key, value in script_args.items():
        flag = "--" + key.replace("_", "-")
        if isinstance(value, bool):
            if value:
                cmd.append(flag)
        else:
            cmd.extend([flag, str(value)])
    print("Running:", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=3600)
    result = {
        "tag": tag,
        "command": cmd,
        "wall_s": time.time() - t0,
        "returncode": proc.returncode,
    }
    # Benchmark scripts print a final JSON line.
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                result["metrics"] = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if proc.returncode != 0:
        result["stderr_tail"] = proc.stderr[-2000:]
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(output_dir / f"{tag}.json", "w") as f:
        json.dump(result, f, indent=2)
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input-config-file", "-i", required=True)
    parser.add_argument("--output-directory", "-o",
                        default="benchmark-results")
    args = parser.parse_args()
    with open(args.input_config_file) as f:
        config = json.load(f)
    output_dir = Path(args.output_directory)
    results = []
    for bench in config.get("benchmarks", []):
        results.append(
            run_one(bench["script"], bench.get("args", {}), output_dir,
                    bench.get("tag", bench["script"])))
    ok = sum(1 for r in results if r["returncode"] == 0)
    print(json.dumps({"total": len(results), "succeeded": ok}))


if __name__ == "__main__":
    main()
