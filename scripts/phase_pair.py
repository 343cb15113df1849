"""One instrumented lo/hi pair with per-phase infoStream walls, to locate
the serial term the Amdahl fit sees in current protocol executions."""
import importlib.util
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
spec = importlib.util.spec_from_file_location(
    "scaling_run", os.path.join(HERE, "scaling_run.py"))
sr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sr)


def run(cores: int, n_docs: int) -> None:
    script = sr.CHILD.format(repo=REPO)
    sr._sync()
    env = dict(os.environ)
    env["SPARK_GRAFT_INFOSTREAM"] = "1"
    env["PYTHONPATH"] = REPO
    out = subprocess.run([sys.executable, "-c", script, str(cores),
                          str(n_docs)], capture_output=True, text=True,
                         timeout=3600, cwd=REPO, env=env)
    print(f"=== local[{cores}] ===")
    for line in out.stdout.splitlines():
        if line.startswith(("IW:", "SCALING_RESULT")):
            print(line)
    if out.returncode:
        print(out.stderr[-1500:])


n_docs = int(os.environ.get("AB_DOCS", "600000"))
run(8, n_docs)   # warm (also measured, but cache-warm like protocol pairs)
run(2, n_docs)
run(8, n_docs)
