"""Scale probe: 50M-doc streaming generate -> annotate -> triples(staged)
-> canonicalize -> edges at the sandbox ceiling; watches spill + pool
utilization via ds.stats()."""
import os, sys, time, shutil, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ray, ray.data as rd

ray.init(address="local", num_cpus=32, include_dashboard=False)
from saber_ray.pipelines.kg import KGConfig, build_graph, dedicated_pool
from saber_ray.sources.synthetic import synthetic_dataset
from saber_ray.stages.canonicalize import canonicalize_edges

NUM_DOCS = 50_000_000
t0 = time.perf_counter()
docs = synthetic_dataset(NUM_DOCS, seed=42)
out = build_graph(docs, KGConfig(batch_size=512, tagger_concurrency=dedicated_pool()))
tmp = tempfile.mkdtemp(prefix="probe_triples_")
try:
    out["triples"].write_parquet(tmp)
    t_stage = time.perf_counter() - t0
    print("STAGE_STATS_BEGIN"); print(out["triples"].stats()[-4000:]); print("STAGE_STATS_END", flush=True)
    nb = max(16, int(ray.cluster_resources().get("CPU", 8)))
    staged = rd.read_parquet(tmp, override_num_blocks=nb)
    n_triples = staged.count()
    edges = canonicalize_edges(staged)
    n_edges = edges.count()
    wall = time.perf_counter() - t0
    print("EDGE_STATS_BEGIN"); print(edges.stats()[-3000:]); print("EDGE_STATS_END", flush=True)
    print(f"RESULT docs={NUM_DOCS} triples={n_triples} edges={n_edges} "
          f"stage_sec={t_stage:.1f} wall={wall:.1f} "
          f"triples_per_sec={n_triples/wall:.0f} docs_per_sec={NUM_DOCS/wall:.0f}")
finally:
    shutil.rmtree(tmp, ignore_errors=True)
# spill evidence
import glob, subprocess
sess = sorted(glob.glob("/tmp/ray/ray/session_*") or glob.glob("/tmp/ray/session_*"), key=os.path.getmtime)[-1]
r = subprocess.run(["grep", "-rhoE", "Spilled [0-9]+ MiB", f"{sess}/logs/raylet.out"],
                   capture_output=True, text=True)
lines = r.stdout.strip().split("\n") if r.stdout.strip() else []
print("SPILL_LINES", lines[-3:] if lines else "none")
ray.shutdown()
