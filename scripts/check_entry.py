"""Validate __graft_entry__.entry() on the current backend (prewarms the
compile cache for the driver's check)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import importlib.util

spec = importlib.util.spec_from_file_location("ge", "/root/repo/__graft_entry__.py")
ge = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ge)

fn, args = ge.entry()
t0 = time.time()
out = jax.jit(fn)(*args)
val = float(jax.device_get(out[0, 0]))
print(f"entry OK: out={out.shape} {out.dtype} sample={val:.4f} "
      f"({time.time()-t0:.1f}s)", flush=True)
