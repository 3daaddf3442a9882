import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SINK_CAP = 16384
B = 2
H = W = 2048; n = H*W
rng = np.random.default_rng(0)

# realistic clustered sinks: clusters of 1-8 sinks near a center
sink_list = []
for b in range(B):
    pts = []
    for _ in range(1500):
        cy, cx = rng.integers(10, H-10), rng.integers(10, W-10)
        k = rng.integers(1, 8)
        for _ in range(k):
            pts.append(((cy + rng.integers(-4, 5)) * W + (cx + rng.integers(-4, 5))))
    pos = np.unique(np.array(pts, np.int64)).astype(np.int32)
    sp = np.full(SINK_CAP, n, np.int32); sp[:len(pos)] = pos
    sink_list.append(sp)
sink_pos = jnp.asarray(np.stack(sink_list))
iota_s = jnp.arange(SINK_CAP, dtype=jnp.int32)

def build_nbr(sp):
    sy, sx = sp // W, sp % W
    real = sp < n
    qs = []
    for dy in range(-3,4):
        for dx in range(-3,4):
            if dy==0 and dx==0: continue
            in_b = real & (sy+dy>=0)&(sy+dy<H)&(sx+dx>=0)&(sx+dx<W)
            qs.append(jnp.where(in_b, sp+dy*W+dx, n))
    queries = jnp.stack(qs)
    slot_img = jnp.full((n+1,), SINK_CAP, jnp.int32).at[
        jnp.where(real, sp, n+1)].set(iota_s, mode="drop", unique_indices=True)
    j = slot_img[queries]
    hit = (j < SINK_CAP) & (queries < n)
    return jnp.where(hit, j, iota_s[None, :])

@jax.jit
@jax.vmap
def uf_old(sp):
    nbr = build_nbr(sp)
    def body(state):
        rep, _ = state
        new = jnp.minimum(rep, jnp.min(rep[nbr], axis=0))
        new = new[new]
        return new, jnp.any(new != rep)
    rep, _ = lax.while_loop(lambda s: s[1], body, (iota_s, jnp.bool_(True)))
    return rep

@jax.jit
@jax.vmap
def uf_dense(sp):
    real = sp < n
    sp_safe = jnp.where(real, sp, n)
    def wmin(img2d):
        p = jnp.pad(img2d, 3, constant_values=SINK_CAP)
        r = p
        for d in range(-3, 4):
            if d == 0: continue
            r = jnp.minimum(r, jnp.roll(p, d, axis=0))
        r2 = r
        for d in range(-3, 4):
            if d == 0: continue
            r2 = jnp.minimum(r2, jnp.roll(r, d, axis=1))
        return r2[3:-3, 3:-3]
    def body(state):
        rep, _ = state
        img = jnp.full((n,), SINK_CAP, jnp.int32).at[sp_safe].set(rep, mode="drop")
        m = wmin(img.reshape(H, W)).ravel()
        nm = m[jnp.where(real, sp, 0)]
        new = jnp.minimum(rep, jnp.where(real, nm, rep))
        new = new[new]
        return new, jnp.any(new != rep)
    rep, _ = lax.while_loop(lambda s: s[1], body, (iota_s, jnp.bool_(True)))
    return rep

def timeit(name, fn, *args):
    o = fn(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0 = time.time()
    for _ in range(3): o = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    print(f"{name:40s} {(time.time()-t0)/(3*B)*1000:8.2f} ms/img", flush=True)
    return o

r_old = timeit("OLD: build_nbr + gather uf", uf_old, sink_pos)
r_new = timeit("NEW: dense window-min uf", uf_dense, sink_pos)
print("match:", bool(jnp.all(r_old == r_new)))
