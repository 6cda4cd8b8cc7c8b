"""Ring-attention ppermute/compute overlap check (PERF.md evidence).

AOT-compiles the ring step against an abstract 8-chip v5e topology and
inspects the post-scheduling HLO: every KV rotation must lower to an async
collective-permute-start/done pair with the step's flash-kernel fusions
scheduled inside the in-flight window (the overlap the reference builds a
second NCCL comm for, parallel_state.py:278-312).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ring_overlap_check.py
"""
import re

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
from long_vita_tpu.ops.ring_attention import ring_attention

try:
    from jax.experimental import topologies
    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:4x2")
    devices = topo.devices
    print("topology devices:", len(devices))
except Exception as e:
    print("topology AOT unavailable:", str(e)[:200])
    raise SystemExit(0)

cp = 8
mesh = Mesh(np.asarray(devices).reshape(cp), ("cp",))
b, s, hq, hkv, d = 1, 2048 * cp, 8, 8, 128
spec = P(None, "cp", None, None)

for window, label in [(0, "plain ring"), (2, "double-ring W=2")]:
    fn = jax.jit(shard_map(
        lambda q, k, v: ring_attention(q, k, v, "cp", False, 1, None, None, window),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False))
    args = [jax.ShapeDtypeStruct((b, s, h_, d), jnp.bfloat16, sharding=jax.sharding.NamedSharding(mesh, spec))
            for h_ in (hq, hkv, hkv)]
    lowered = fn.lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    starts = len(re.findall(r"collective-permute-start", txt))
    sync = len(re.findall(r" collective-permute\(", txt))
    # measure ops scheduled between start and matching done
    import re as _re
    lines = txt.splitlines()
    start_pos = {}
    for i, ln in enumerate(lines):
        m = _re.search(r"(%?\S*collective-permute-start[^ ]*) =", ln)
        if m:
            start_pos[m.group(1).lstrip('%')] = i
    results_pairs = []
    for i, ln in enumerate(lines):
        if "collective-permute-done" in ln and "=" in ln:
            m = _re.search(r"collective-permute-done\(([^)]+)\)", ln)
            if not m:
                continue
            src_name = m.group(1).strip().lstrip('%')
            j = start_pos.get(src_name)
            if j is None:
                continue
            between = lines[j + 1 : i]
            fus = sum(1 for b in between if "fusion" in b or "custom-call" in b)
            results_pairs.append((i - j - 1, fus))
    print(f"{label}: async-starts={starts} sync={sync} "
          f"(ops,fusions)-between-start/done: {results_pairs[:12]}")
