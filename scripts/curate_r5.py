"""Curate round-5 chip-bound artifacts from /tmp into the repo root.

Idempotent and safe to run at ANY point in the round-5 pipeline: it copies
whatever exists so far (render benches -> RENDER_r05.json, projection ->
PROJECTION_r05.json, evaluate-CLI artifacts -> EVALUATION_r5_{dynamic,sharp}
.json) and skips what doesn't. The pipeline calls it after every stage so a
round boundary mid-pipeline loses at most the stage in flight; the driver
commits whatever is curated.
"""

import glob
import json
import os
import shutil

ART = "/tmp/r5_artifacts"
MODELS = os.environ.get("NERSEMBLE_MODELS_PATH", "/tmp/ns_quality_models")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(p):
    try:
        with open(p) as f:
            txt = f.read().strip()
        # bench scripts print one JSON line (possibly after warmup noise)
        for line in reversed(txt.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except FileNotFoundError:
        return None
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}", "source": p}
    return {"error": "no JSON line", "source": p}


def main():
    render = {"protocol": "802x550, same as RENDER_r04; sharp = carved "
                          "checkpoint (VERDICT r4 #4), dynamic = the flagship "
                          "dynamic checkpoint (deformation + 32-table blend "
                          "at render time)"}
    wrote = []
    sharp = load(f"{ART}/render_sharp.json")
    dyn = load(f"{ART}/render_dynamic.json")
    if sharp is not None:
        render["sharp"] = sharp
    if dyn is not None:
        render["dynamic"] = dyn
    if sharp is not None or dyn is not None:
        with open(os.path.join(REPO, "RENDER_r05.json"), "w") as f:
            json.dump(render, f, indent=2)
        wrote.append("RENDER_r05.json")

    proj = load(f"{ART}/projection_dynamic.json")
    if proj is not None:
        with open(os.path.join(REPO, "PROJECTION_r05.json"), "w") as f:
            json.dump(proj, f, indent=2)
        wrote.append("PROJECTION_r05.json")

    for tag, pat in [("dynamic", f"{MODELS}/nersemble/*quality-dynamic*"),
                     ("sharp", f"{MODELS}/nersemble/*quality-static-sharp*")]:
        dirs = sorted(glob.glob(pat))
        if not dirs:
            continue
        hits = sorted(glob.glob(
            f"{dirs[-1]}/evaluation/*/evaluation_result.json"))
        if hits:
            dest = os.path.join(REPO, f"EVALUATION_r5_{tag}.json")
            shutil.copy(hits[-1], dest)
            wrote.append(f"EVALUATION_r5_{tag}.json <- {hits[-1]}")
    print("curated:", wrote if wrote else "nothing yet")


if __name__ == "__main__":
    main()
