#!/usr/bin/env python
"""Stage profile of the fast decode pipeline on the real chip.

Usage: python tools/profile_decode.py [n_blocks] [max_batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402

N_BLOCKS = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
MAX_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def main():
    from bench import make_corpus, warm_tunnel
    from flac_tpu import EncoderConfig
    from flac_tpu.encoder import encode_file_to_flac
    from flac_tpu import native
    from flac_tpu.decoder import (decode_stream_tpu, parse_metadata,
                                  scan_frames)
    from flac_tpu.decoder_fast import (_dispatch_batch, _group_arrays,
                                       decode_frame_list_fast)

    pcm = make_corpus(N_BLOCKS)
    pcm_bytes = pcm.shape[1] * 4
    print(f"corpus: {pcm_bytes/1e6:.1f} MB PCM")
    data = encode_file_to_flac(pcm, EncoderConfig.from_preset(8).resolve(),
                               batch_frames=128, super_batches=4)
    print(f"compressed: {len(data)/1e6:.1f} MB")
    cold = warm_tunnel()
    print(f"(cold d2h spin-up {cold:.0f}s)")

    def t(name, fn, reps=2):
        fn()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:42s} {best*1e3:9.1f} ms   "
              f"{pcm_bytes/best/1e6:8.1f} MB/s-PCM")
        return best

    st, pos = parse_metadata(data, 4)
    t("scan_frames (native)", lambda: scan_frames(data, st, pos))
    frames = scan_frames(data, st, pos)
    for f, nxt in zip(frames, frames[1:] + [None]):
        f["size"] = (nxt["offset"] if nxt else len(data)) - f["offset"]
    arr = np.frombuffer(data, np.uint8)
    bs, ch = frames[0]["blocksize"], frames[0]["channels"]
    idxs = list(range(len(frames)))

    def parse_all():
        for lo in range(0, len(idxs), MAX_BATCH):
            b = idxs[lo:lo + MAX_BATCH]
            offs, starts, sizes, asg, chb = _group_arrays(frames, b, ch)
            native.parse_frames(arr, offs, starts, sizes, chb, bs)
    t("phase-1 parse (native, all batches)", parse_all)

    # host restore for comparison
    def host_all():
        for lo in range(0, len(idxs), MAX_BATCH):
            b = idxs[lo:lo + MAX_BATCH]
            offs, starts, sizes, asg, chb = _group_arrays(frames, b, ch)
            pg = native.parse_frames(arr, offs, starts, sizes, chb, bs)
            native.restore_subframes(pg)
    t("parse + host restore (all-CPU)", host_all)

    # dispatch+fetch one batch round trip (device restore)
    b0 = idxs[:MAX_BATCH]

    def one_batch():
        (out, _), pg, asg = _dispatch_batch(arr, frames, b0, bs, ch, 16)
        np.asarray(out)
    t("device batch (parse+upload+restore+fetch)", one_batch)

    import jax.numpy as jnp

    def compute_only():
        (out, _), pg, asg = _dispatch_batch(arr, frames, b0, bs, ch, 16)
        np.asarray(jnp.sum(out.astype(jnp.int32)))   # tiny dependent fetch
    t("device batch restore compute (scalar fetch)", compute_only)

    for mb in (512, 256, 128):
        def list_fast():
            st.errors = []
            decode_frame_list_fast(data, st, frames, max_batch=mb)
        t(f"decode_frame_list_fast (max_batch={mb})", list_fast)

    def full():
        decode_stream_tpu(data, max_batch=MAX_BATCH)
    t("decode_stream_tpu (incl MD5 verify)", full)


if __name__ == "__main__":
    main()
