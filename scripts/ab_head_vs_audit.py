"""One-off A/B: is HEAD's build slower than the 871a0b7 audit commit at
local[8], same input, same session config? Interleaved passes so both samples
see the same host state. Reuses scaling_run's child template with the repo
path switched between the main tree and a worktree checkout of the audit
commit."""
import importlib.util
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
AUDIT = os.environ.get("AB_AUDIT", os.path.join(REPO, ".ab_audit"))

spec = importlib.util.spec_from_file_location(
    "scaling_run", os.path.join(HERE, "scaling_run.py"))
sr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sr)


def run(repo_path: str, cores: int, n_docs: int) -> dict:
    script = sr.CHILD.format(repo=repo_path)
    sr._sync()
    steal0 = sr._read_steal()
    env = dict(os.environ)
    # workers resolve the package from cwd/PYTHONPATH — pin BOTH to the
    # target tree so driver and executors run the same code version
    env["PYTHONPATH"] = repo_path
    out = subprocess.run([sys.executable, "-c", script, str(cores),
                          str(n_docs)], capture_output=True, text=True,
                         timeout=3600, cwd=repo_path, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            r = json.loads(line[len("SCALING_RESULT "):])
            r["steal_frac"] = round(
                (sr._read_steal() - steal0) / (r["wall_s"] * cores), 4)
            return r
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def main():
    n_docs = int(os.environ.get("AB_DOCS", "600000"))
    reps = int(os.environ.get("AB_REPS", "2"))
    results = {"head": [], "audit": []}
    # warmup (corpus gen if missing + JIT/page cache) — not measured
    run(REPO, 8, n_docs)
    for i in range(reps):
        for name, path in (("head", REPO), ("audit", AUDIT)):
            r = run(path, 8, n_docs)
            results[name].append(r)
            print(f"pass {i+1} {name}: wall {r['wall_s']:.1f}s "
                  f"steal {100*r['steal_frac']:.2f}%", flush=True)
    print("AB_RESULT " + json.dumps(
        {k: [round(r["wall_s"], 1) for r in v] for k, v in results.items()}))


if __name__ == "__main__":
    main()
