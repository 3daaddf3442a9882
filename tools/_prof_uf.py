import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SINK_CAP = 16384
B = 2
# build a realistic nbr array: random sink positions in 2048^2 with Chebyshev<=3 adjacency
rng = np.random.default_rng(0)
H = W = 2048; n = H*W
nbrs = []
for b in range(B):
    pos = np.sort(rng.choice(n, size=6000, replace=False)).astype(np.int32)
    sink_pos = np.full(SINK_CAP, n, np.int32); sink_pos[:6000] = pos
    sy, sx = sink_pos // W, sink_pos % W
    real = sink_pos < n
    iota_s = np.arange(SINK_CAP, dtype=np.int32)
    slot = np.full(n+1, SINK_CAP, np.int32); slot[pos] = iota_s[:6000]
    qs = []
    for dy in range(-3,4):
        for dx in range(-3,4):
            if dy==0 and dx==0: continue
            in_b = real & (sy+dy>=0)&(sy+dy<H)&(sx+dx>=0)&(sx+dx<W)
            q = np.where(in_b, sink_pos+dy*W+dx, n)
            j = slot[np.clip(q,0,n)]
            hit = (j<SINK_CAP)&(q<n)
            qs.append(np.where(hit, j, iota_s))
    nbrs.append(np.stack(qs))
nbr = jnp.asarray(np.stack(nbrs))

iota_s = jnp.arange(SINK_CAP, dtype=jnp.int32)

@jax.jit
@jax.vmap
def uf_count(nbr):
    def body(state):
        rep, _, it = state
        new = jnp.minimum(rep, jnp.min(rep[nbr], axis=0))
        new = new[new]
        return new, jnp.any(new != rep), it+1
    rep, _, it = lax.while_loop(lambda s: s[1], body, (iota_s, jnp.bool_(True), 0))
    return rep, it

rep, it = uf_count(nbr)
print("iterations:", np.asarray(it))

def timeit(name, fn, *args):
    o = fn(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0 = time.time()
    for _ in range(3): o = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    print(f"{name:40s} {(time.time()-t0)/(3*B)*1000:8.2f} ms/img", flush=True)
    return o

timeit("while_loop uf (baseline)", uf_count, nbr)

@jax.jit
@jax.vmap
def uf_multijump(nbr):
    def body(state):
        rep, _ = state
        new = jnp.minimum(rep, jnp.min(rep[nbr], axis=0))
        new = new[new]; new = new[new]; new = new[new]
        return new, jnp.any(new != rep)
    rep, _ = lax.while_loop(lambda s: s[1], body, (iota_s, jnp.bool_(True)))
    return rep

r2 = timeit("while_loop uf (3 jumps/round)", uf_multijump, nbr)
print("match:", bool(jnp.all(r2 == rep)))

@jax.jit
def uf_flat(nbr):
    # flatten batch into one gather: offset indices per batch row
    off = (jnp.arange(B, dtype=jnp.int32) * SINK_CAP)[:, None, None]
    nbr_f = (nbr + off).reshape(-1)          # (B*48*S,)
    iota_f = jnp.tile(iota_s, (B,)) + jnp.repeat(jnp.arange(B, dtype=jnp.int32)*SINK_CAP, SINK_CAP)
    def body(state):
        rep, _ = state
        g = rep[nbr_f].reshape(B, 48, SINK_CAP)
        new = jnp.minimum(rep.reshape(B, SINK_CAP), jnp.min(g, axis=1)).reshape(-1)
        new = jnp.minimum(new, new[new]) if False else new[new]
        return new, jnp.any(new != rep)
    rep, _ = lax.while_loop(lambda s: s[1], body, (iota_f, jnp.bool_(True)))
    return rep.reshape(B, SINK_CAP) - (jnp.arange(B, dtype=jnp.int32)*SINK_CAP)[:, None]

r3 = timeit("while_loop uf (flattened batch)", uf_flat, nbr)
print("match:", bool(jnp.all(r3 == rep)))

# precompute per-node neighbor min once per round but with int32 min over axis...
# alternative: reduce the 48-gather to a segment-min via one sorted edge list
@jax.jit
@jax.vmap
def uf_edge(nbr):
    # edges (i -> nbr[k,i]); symmetric already. Precompute nothing: per round,
    # neighbor-min via scatter-min instead of gather: rep_min[i] = min over edges
    def body(state):
        rep, _ = state
        nm = jnp.full((SINK_CAP,), SINK_CAP, jnp.int32)
        src = jnp.broadcast_to(iota_s, nbr.shape)
        nm = nm.at[nbr].min(rep[src])  # scatter-min along edges
        new = jnp.minimum(rep, nm)
        new = new[new]
        return new, jnp.any(new != rep)
    rep, _ = lax.while_loop(lambda s: s[1], body, (iota_s, jnp.bool_(True)))
    return rep

r4 = timeit("while_loop uf (scatter-min)", uf_edge, nbr)
print("match:", bool(jnp.all(r4 == rep)))
