"""Does the persistent XLA compile cache work on this backend at all?

Round 4 wired JAX_COMPILATION_CACHE_DIR into every quality-run script, but
.jax_tpu_cache stayed EMPTY across multiple protocol runs — so resumes
re-paid every multi-minute compile and the watchdog story carried the
whole load. This probes the cache end-to-end with debug logging on and
reports what the cache layer says (suspect: the axon PJRT client does not
implement executable serialization, which JAX treats as a silent no-op).

Usage: /opt/venv/bin/python benchmark/cache_probe.py
"""
import logging
import os
import sys
import tempfile
from pathlib import Path

cache = tempfile.mkdtemp(prefix="jax_cache_probe_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = cache
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.DEBUG)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax.experimental.compilation_cache"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax
import jax.numpy as jnp
import numpy as np

print(f"backend: {jax.default_backend()}  cache dir: {cache}", flush=True)
x = jnp.arange(1024 * 1024, dtype=jnp.float32).reshape(1024, 1024)
y = jax.jit(lambda a: (a @ a.T).sum())(x)
print("result:", np.asarray(y), flush=True)
entries = list(Path(cache).iterdir())
print(f"cache entries after one compile: {len(entries)}", flush=True)
for e in entries[:5]:
    print("  ", e.name, e.stat().st_size, flush=True)
