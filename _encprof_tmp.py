import time
import numpy as np
import jax, jax.numpy as jnp
from flac_tpu.config import EncoderConfig
from flac_tpu.encoder import encode_batch
B, N = 256, 4096
cfg = EncoderConfig.from_preset(8).resolve()
rng = np.random.default_rng(0)
t = np.arange(B * N) / 44100
sig = (20000*np.sin(2*np.pi*440*t) + rng.normal(0, 800, B*N))
pcm = np.stack([sig, 0.8*sig]).astype(np.int32).reshape(2, B, N).transpose(1, 0, 2)
x = jax.device_put(jnp.asarray(pcm))
fn = jax.jit(lambda x: encode_batch(x, np.int64(0), cfg, N))
out = fn(x); jax.block_until_ready(out)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(2):
        out = fn(x)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.sum(leaf.astype(jnp.int32) if leaf.dtype != jnp.float32 else leaf))
    best = min(best, (time.perf_counter()-t0)/2)
mb = B*N*2*2/1e6
print(f"encode_batch B={B}: {best*1e3:.1f} ms = {mb/best:.0f} MB/s PCM device compute")
