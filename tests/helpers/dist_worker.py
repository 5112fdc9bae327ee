"""One process of the 2-process CPU-mesh distributed test."""
import os, sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from genmap_tpu.parallel.dist import maybe_initialize
assert maybe_initialize()
import numpy as np
print(f"proc {jax.process_index()}/{jax.process_count()} devices={len(jax.devices())} local={len(jax.local_devices())}", flush=True)
assert jax.process_count() == 2 and len(jax.devices()) == 8

from genmap_tpu.engine.mappability import MappabilityEngine, SearchParams
from genmap_tpu.index.build import build_index
from genmap_tpu.io.fasta import FastaFile
from genmap_tpu.parallel.partmesh import part_data_mesh

rng = np.random.default_rng(3)
ff = FastaFile(name="g.fa")
ff.ids = ["c1", "c2", "c3", "c4"]
ff.seqs = [rng.integers(0, 4, size=600, dtype=np.uint8) for _ in range(4)]
data = build_index([ff], sampling=5, max_part_symbols=2500)
assert len(data.parts) == 2

params = SearchParams(length=10, overlap=8, rev_compl=True)
mesh = part_data_mesh(2, 8)  # 2 parts x 4 data shards, spanning both processes
eng = MappabilityEngine(data, batch_blocks=16, mesh=mesh)
res = eng.compute_file(eng.layouts[0], params, errors=1, cap=255)

eng1 = MappabilityEngine(data, batch_blocks=16)
res1 = eng1.compute_file(eng1.layouts[0], params, errors=1, cap=255)
np.testing.assert_array_equal(res.c, res1.c)
print(f"proc {jax.process_index()}: distributed == local OK", flush=True)
