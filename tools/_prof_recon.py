"""Micro-profile _finish_masks_compact internals on the real chip."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arcadia_microscopy_tools_tpu.models import flows as F
from arcadia_microscopy_tools_tpu.models.unet_s2d import apply_unet_s2d, s2d_params
from arcadia_microscopy_tools_tpu.models.weights import load_checkpoint, seeded_params
from pathlib import Path

B = 2; H = W = 2048; NITER = 200; MAX_CELLS = 1024
CAP = min(-(-int(H * W * 0.0625) // 8192) * 8192, H * W)
SINK_CAP = max(1024, 16 * MAX_CELLS)

ckpt = Path(__file__).resolve().parent.parent / "checkpoints" / "unet"
params = load_checkpoint(ckpt)
sparams = s2d_params(params)

rng = np.random.default_rng(0)
base = rng.normal(150, 15, (B, H, W)).clip(0, None)
yy, xx = np.mgrid[0:48, 0:48]
blob = 2800 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / 40.0)
for b in range(B):
    for _ in range(300):
        cy, cx = rng.integers(24, H - 24), rng.integers(24, W - 24)
        base[b, cy - 24:cy + 24, cx - 24:cx + 24] += blob
seg = jnp.asarray(base.astype(np.uint16))

from arcadia_microscopy_tools_tpu.ops.fused import _percentile_from_cum
from arcadia_microscopy_tools_tpu.ops.stats import histogram_int

@jax.jit
@jax.vmap
def normalize(x):
    counts, _ = histogram_int(x, 65536)
    cum = jnp.cumsum(counts.astype(jnp.float32))
    p1 = _percentile_from_cum(cum, 1.0, H * W)
    p99 = _percentile_from_cum(cum, 99.0, H * W)
    xf = x.astype(jnp.float32)
    xn = jnp.clip((xf - p1) / jnp.maximum(p99 - p1, 1e-6), 0, 1)
    return jnp.stack([xn, xn, xn], -1)

net_in = normalize(seg)
out = jax.jit(lambda z: apply_unet_s2d(sparams, z))(net_in)

@jax.jit
@jax.vmap
def advect(o):
    return F._follow_sparse_core(o[..., :2] / 5.0, o[..., 2] > 0.0, NITER, CAP)

idx, valid, landing, okf = advect(out)

def timeit(name, fn, *args):
    o = fn(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0 = time.time()
    for _ in range(3):
        o = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    print(f"{name:44s} {(time.time()-t0)/(3*B)*1000:8.2f} ms/img", flush=True)
    return o

n = H * W
iota = jnp.arange(CAP, dtype=jnp.int32)

@jax.jit
@jax.vmap
def s_sort(valid, landing):
    land_key = jnp.where(valid, landing, n)
    ls, _ = lax.sort((land_key, iota), num_keys=1)
    return ls

ls = timeit("cap sort (landing)", s_sort, valid, landing)

@jax.jit
@jax.vmap
def s_runs(ls):
    edge = jnp.ones((1,), bool)
    is_new = jnp.concatenate([edge, ls[1:] != ls[:-1]])
    is_last = jnp.concatenate([ls[1:] != ls[:-1], edge])
    first_idx = lax.cummax(jnp.where(is_new, iota, 0))
    last_idx = CAP - 1 - lax.cummax(jnp.where(is_last[::-1], iota, 0))[::-1]
    count = last_idx - first_idx + 1
    sink_run = is_new & (count >= 3) & (ls < n)
    rank = jnp.cumsum(sink_run.astype(jnp.int32))
    sink_pos = (jnp.full((SINK_CAP,), n, jnp.int32)
        .at[jnp.where(sink_run, rank - 1, SINK_CAP)].set(ls, mode="drop"))
    return sink_pos

sink_pos = timeit("run-length + sink extraction", s_runs, ls)

@jax.jit
@jax.vmap
def s_adj(sink_pos):
    sy = sink_pos // W; sx = sink_pos % W
    real = sink_pos < n
    iota_s = jnp.arange(SINK_CAP, dtype=jnp.int32)
    qs = []
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            if dy == 0 and dx == 0: continue
            in_b = real & (sy+dy >= 0) & (sy+dy < H) & (sx+dx >= 0) & (sx+dx < W)
            qs.append(jnp.where(in_b, sink_pos + dy*W + dx, n))
    queries = jnp.stack(qs)
    slot_img = jnp.full((n+1,), SINK_CAP, jnp.int32).at[
        jnp.where(real, sink_pos, n+1)].set(iota_s, mode="drop", unique_indices=True)
    j = slot_img[queries]
    hit = (j < SINK_CAP) & (queries < n)
    return jnp.where(hit, j, iota_s[None, :])

nbr = timeit("slot-img scatter + 48-gather adjacency", s_adj, sink_pos)

@jax.jit
@jax.vmap
def s_uf(nbr):
    iota_s = jnp.arange(SINK_CAP, dtype=jnp.int32)
    def uf_body(state):
        rep, _ = state
        new = jnp.minimum(rep, jnp.min(rep[nbr], axis=0))
        new = new[new]
        return new, jnp.any(new != rep)
    rep, _ = lax.while_loop(lambda s: s[1], uf_body, (iota_s, jnp.bool_(True)))
    return rep

rep = timeit("union-find while_loop", s_uf, nbr)

@jax.jit
@jax.vmap
def s_comp(sink_pos, rep, valid, landing):
    sy = sink_pos // W; sx = sink_pos % W
    real = sink_pos < n
    iota_s = jnp.arange(SINK_CAP, dtype=jnp.int32)
    tl = jnp.where(real, jnp.maximum(sy-1,0)*W + jnp.maximum(sx-1,0), n)
    key_root = jnp.full((SINK_CAP,), n, jnp.int32).at[rep].min(tl, mode="drop")
    is_root = (rep == iota_s) & real
    root_key = jnp.where(is_root, key_root, n)
    order_key, root_ids = lax.sort((root_key, iota_s), num_keys=1)
    root_label = (jnp.zeros((SINK_CAP,), jnp.int32).at[root_ids]
        .set(jnp.where(order_key < n, iota_s + 1, 0)))
    lab_sink = jnp.where(real, root_label[rep], 0)
    sink_label_img = (jnp.zeros((n,), jnp.int32)
        .at[jnp.where(real, sink_pos, n)].set(lab_sink, mode="drop").reshape(H, W))
    mop = sink_label_img
    pad = jnp.pad(sink_label_img, 1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0: continue
            mop = jnp.maximum(mop, lax.dynamic_slice(pad, (1+dy, 1+dx), (H, W)))
    composite = jnp.where(sink_label_img > 0, sink_label_img, mop).ravel()
    return jnp.where(valid, composite[jnp.where(valid, landing, 0)], 0)

lab_c = timeit("label order + dilate + assign gather", s_comp, sink_pos, rep, valid, landing)

@jax.jit
@jax.vmap
def s_tail(lab_c, valid, idx):
    sizes = jnp.zeros((SINK_CAP+1,), jnp.int32).at[lab_c].add(valid.astype(jnp.int32))
    ids = jnp.arange(SINK_CAP+1, dtype=jnp.int32)
    keep = (ids > 0) & (sizes > 0) & (sizes >= 20)
    mapping = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)), 0)
    lc = mapping[lab_c]
    idx_safe = jnp.where(valid, idx, n)
    return jnp.zeros((n,), jnp.int32).at[idx_safe].set(lc, mode="drop").reshape(H, W)

timeit("size filter + label-image scatter", s_tail, lab_c, valid, idx)

@jax.jit
@jax.vmap
def whole(idx, valid, landing, o):
    return F._finish_masks_compact(idx, valid, landing, o[..., :2]/5.0, H, W, 0.0, MAX_CELLS, 20)

timeit("whole _finish_masks_compact", whole, idx, valid, landing, out)
