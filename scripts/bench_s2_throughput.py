"""Registered-frames-per-hour benchmark for the stage-2 driver (TPU).

BASELINE.json north star: >= 1 registered frame/sec/chip (aspirational; the
reference CUDA pipeline takes "a few minutes" per frame, README.md:96). This
drives the REAL `s2_registration.py` CLI over a synthetic sequence twice:

  ref-equiv   --cameras_per_step 1 --early_stop_rel 0   (reference sampling)
  tpu         driver defaults (4-camera steps + plateau early-stop)

and reports wall-clock frames/hour plus the final per-frame test PSNR (from
the driver's JSONL quality logs) so the speedup is shown not to cost quality.

Run: python scripts/bench_s2_throughput.py [--frames 4] [--iters 3000]
"""
import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/gg_s2bench")


def ensure_dataset(n_frames: int):
    marker = DATA / f"data/subj/seq1/done_{n_frames}"
    if marker.exists():
        return
    subprocess.run([
        sys.executable, "-c",
        "from gaussian_garments_tpu.data.synthetic import write_reference_layout;"
        f"write_reference_layout('{DATA}/data','{DATA}/out','subj','seq1',"
        f"n_cams=8,n_frames={n_frames},nx=32,ny=32,res=512)"
    ], check=True, cwd=REPO, env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
                                  "JAX_PLATFORMS": "cpu"})
    marker.parent.mkdir(parents=True, exist_ok=True)
    marker.touch()


def run_driver(extra, label, iters, timeout_s=3600):
    env = {**os.environ,
           "GG_DATA_ROOT": str(DATA / "data"),
           "GG_OUTPUT_ROOT": str(DATA / "out"),
           "GG_AUX_ROOT": str(DATA / "aux")}
    cmd = [sys.executable, "s2_registration.py", "-s", "subj", "-q", "seq1",
           "-t", "Template", "--eval",
           "--first_frame_iterations_cross", "600",
           "--other_frame_iterations", str(iters),
           "--collision_iteration", str(max(iters // 5, 1)),
           "--ff_collision_iteration", "100"] + extra
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=REPO, env=env, timeout=timeout_s,
                       capture_output=True, text=True)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-3000:])
        raise RuntimeError(f"{label} run failed")
    return dt, r.stdout


def template_fit():
    """One-time template fit shared by both configs."""
    tmpl_done = DATA / "out/subj/stage2/Template/local_point_cloud.ply"
    if tmpl_done.exists():
        return
    env = {**os.environ,
           "GG_DATA_ROOT": str(DATA / "data"),
           "GG_OUTPUT_ROOT": str(DATA / "out"),
           "GG_AUX_ROOT": str(DATA / "aux")}
    subprocess.run([
        sys.executable, "s2_registration.py", "-s", "subj", "-q", "seq1",
        "-tf", "0", "--first_frame_iterations", "800",
        "--ff_collision_iteration", "100"],
        check=True, cwd=REPO, env=env, timeout=3600)


def frame_quality(seq_dir: Path):
    """Final test PSNR per frame from the driver's JSONL logs."""
    out = {}
    for f in sorted((seq_dir / "logs").glob("frame_*.jsonl")):
        psnr = None
        for line in f.read_text().splitlines():
            d = json.loads(line)
            psnr = d.get("test_psnr", psnr)
        out[f.stem] = psnr
    return out


def main():
    # persistent XLA compilation cache: retries after a tunnel wedge
    # re-use compiles instead of paying ~30 s each again
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3000,
                    help="other_frame_iterations for the ref-equiv config")
    args = ap.parse_args()

    ensure_dataset(args.frames)
    template_fit()

    results = {}
    for label, extra in (
        ("ref_equiv", ["--cameras_per_step", "1", "--early_stop_rel", "0"]),
        ("tpu_defaults", []),
    ):
        dt, stdout = run_driver(extra, label, args.iters)
        seq_dir = DATA / "out/subj/stage2/seq1"
        q = frame_quality(seq_dir)
        # warm-started frames only (frame 0 is the cross-sequence cold fit)
        n_warm = args.frames - 1
        results[label] = {
            "wall_s_total": round(dt, 1),
            "frames": args.frames,
            "frames_per_hour": round(args.frames / (dt / 3600.0), 2),
            "test_psnr": {k: round(v, 2) for k, v in q.items() if v},
            "early_stops": stdout.count("plateau at iter"),
        }
        print(json.dumps({label: results[label]}), flush=True)

    a, b = results["ref_equiv"], results["tpu_defaults"]
    print(json.dumps({
        "metric": "s2_registered_frames_per_hour",
        "ref_equiv": a["frames_per_hour"],
        "tpu_defaults": b["frames_per_hour"],
        "speedup": round(b["frames_per_hour"] / a["frames_per_hour"], 2),
    }))


if __name__ == "__main__":
    main()
