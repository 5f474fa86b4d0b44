"""Multi-host scale-out: jax.distributed init, corpus runner, ordered
DCN splice.

The reference's top scale-out is a 64-thread frame pool in one process
(stream_encoder.c:3490-3614).  The TPU-native story (SURVEY §2.3) has two
tiers:

- corpus tier (DCN): whole FILES shard round-robin across hosts — zero
  cross-host traffic in the compute path; each host runs the full
  single-host pipeline on its shard.
- frame tier (ICI): within a host, frames shard over the local mesh
  (parallel/shard.py), bytes gathered in order on the host.

For one giant file across hosts, `encode_file_ranges` gives each host a
contiguous frame RANGE; hosts encode independently and the byte splice is
ordered by construction — only per-range byte lengths cross DCN (via
process_allgather) so every host can compute its file offset.  Frame
numbering is absolute, so the spliced stream is byte-identical to a
single-host encode (tests/test_shard.py proves the topology invariance
of per-frame bytes).
"""

from __future__ import annotations

import os

import numpy as np

from ..config import EncoderConfig


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-host; no-op (and
    (0, 1)) in single-process runs.

    Reads JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID from the
    environment when arguments are omitted.  Returns (process_index,
    process_count).
    """
    import jax
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if coordinator:
        num_processes = num_processes or int(
            os.environ.get("JAX_NUM_PROCESSES", "1"))
        process_id = process_id if process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", "0"))
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def host_file_shard(paths: list[str], host_id: int,
                    num_hosts: int) -> list[str]:
    """Round-robin file assignment (corpus tier)."""
    return [p for i, p in enumerate(paths) if i % num_hosts == host_id]


def encode_corpus(paths: list[str], cfg: EncoderConfig, out_dir: str,
                  *, batch_frames: int = 64, verify: bool = False,
                  host_id: int | None = None,
                  num_hosts: int | None = None) -> list[tuple[str, int]]:
    """Encode this host's shard of a multi-file corpus.

    Every file is encoded with the full single-host pipeline (local-mesh
    frame DP happens inside encode_batch via jit auto-sharding when the
    caller has installed a sharding context).  Returns (out_path,
    compressed_size) for the files THIS host produced.
    """
    import jax

    from .. import container
    from ..encoder import StreamEncoder

    host_id = jax.process_index() if host_id is None else host_id
    num_hosts = jax.process_count() if num_hosts is None else num_hosts
    mine = host_file_shard(paths, host_id, num_hosts)
    os.makedirs(out_dir, exist_ok=True)
    results = []
    for path in mine:
        info = container.sniff_and_read(open(path, "rb").read())
        file_cfg = EncoderConfig(
            **{**cfg.__dict__, "sample_rate": info.sample_rate,
               "channels": info.channels,
               "bits_per_sample": info.bits_per_sample}).resolve()
        base = os.path.splitext(os.path.basename(path))[0] + ".flac"
        out_path = os.path.join(out_dir, base)
        with open(out_path, "wb") as f:
            enc = StreamEncoder(f, file_cfg, batch_frames=batch_frames,
                                verify=verify)
            enc.process(info.samples)
            enc.finish()
        results.append((out_path, os.path.getsize(out_path)))
    return results


def encode_file_ranges(blocks: np.ndarray, cfg: EncoderConfig,
                       *, host_id: int | None = None,
                       num_hosts: int | None = None,
                       mesh=None) -> tuple[bytes, np.ndarray, int]:
    """Frame-range sharding of ONE file across hosts (frame tier).

    blocks: [B, C, N] — the SAME array on every host (or at least this
    host's range of it); host h encodes the contiguous range
    [h*ceil(B/H), ...) with absolute frame numbers, so concatenating the
    per-host byte blobs in host order reproduces the single-host stream
    byte-for-byte.

    Returns (my_bytes, all_lengths [H] int64, my_offset) where my_offset
    is this host's byte offset in the spliced stream — all_lengths
    crosses DCN via process_allgather (the only cross-host traffic).
    """
    import jax

    from .shard import data_mesh, encode_blocks_dp

    host_id = jax.process_index() if host_id is None else host_id
    num_hosts = jax.process_count() if num_hosts is None else num_hosts
    B = blocks.shape[0]
    per = -(-B // num_hosts)
    lo, hi = host_id * per, min((host_id + 1) * per, B)
    from .. import native

    def rows_to_blob(wbytes, lens64):
        if native.AVAILABLE:
            return native.gather_frames(wbytes, lens64)
        return b"".join(wbytes[i, :int(lens64[i])].tobytes()
                        for i in range(wbytes.shape[0]))

    if num_hosts > 1 and jax.process_count() != num_hosts:
        # single-process simulation (host_id/num_hosts injected): a real
        # allgather would see only ONE process and mis-splice.  ONE
        # sharded encode of the full batch yields every frame's bytes;
        # my blob is my row range and the per-host lengths are row-range
        # sums — O(B) total, not O(H*B).  Frame bytes are deterministic
        # and base-frame-number-invariant (tests/test_shard.py), so these
        # equal what the real hosts would produce.
        mesh = mesh or data_mesh(jax.local_devices())
        words, lens = encode_blocks_dp(blocks, 0, cfg, mesh)
        lens64 = lens.astype(np.int64)
        wbytes = words.astype(">u4").view(np.uint8).reshape(
            words.shape[0], -1)
        my_blob = rows_to_blob(wbytes[lo:hi], lens64[lo:hi]) \
            if lo < hi else b""
        all_lens = np.array(
            [int(lens64[h * per:min((h + 1) * per, B)].sum())
             for h in range(num_hosts)], np.int64)
        my_offset = int(all_lens[:host_id].sum())
        return my_blob, all_lens, my_offset

    if lo >= hi:
        my_blob = b""
    else:
        mesh = mesh or data_mesh(jax.local_devices())
        words, lens = encode_blocks_dp(blocks[lo:hi], lo, cfg, mesh)
        wbytes = words.astype(">u4").view(np.uint8).reshape(
            words.shape[0], -1)
        my_blob = rows_to_blob(wbytes, lens.astype(np.int64))
    if num_hosts > 1:
        # real multi-host: per-range byte lengths are the only DCN traffic
        from jax.experimental import multihost_utils
        all_lens = np.asarray(multihost_utils.process_allgather(
            np.array([len(my_blob)], np.int64))).reshape(-1)
    else:
        all_lens = np.array([len(my_blob)], np.int64)
    my_offset = int(all_lens[:host_id].sum())
    return my_blob, all_lens, my_offset


def main(argv=None) -> int:
    """Corpus runner CLI:
    python -m flac_tpu.parallel.multihost -5 -o OUTDIR file1.wav ..."""
    import argparse

    p = argparse.ArgumentParser(prog="flac-tpu-corpus")
    for lvl in range(9):
        p.add_argument(f"-{lvl}", dest="preset", action="store_const",
                       const=lvl)
    p.set_defaults(preset=5)
    p.add_argument("-o", "--out-dir", required=True)
    p.add_argument("-V", "--verify", action="store_true")
    p.add_argument("--batch-frames", type=int, default=64)
    p.add_argument("files", nargs="+")
    args = p.parse_args(argv)

    host, nhosts = init_distributed()
    cfg = EncoderConfig.from_preset(args.preset)
    results = encode_corpus(args.files, cfg, args.out_dir,
                            batch_frames=args.batch_frames,
                            verify=args.verify)
    for path, size in results:
        print(f"[host {host}/{nhosts}] {path}: {size} bytes")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
