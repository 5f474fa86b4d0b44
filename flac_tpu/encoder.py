"""Stream encoder: jitted batch pipeline + host-side stream assembly.

Architecture (vs the reference's callback-driven single-frame pipeline,
src/libFLAC/stream_encoder.c):

  [B, C, N] int32 PCM blocks
      -> stereo candidates + wasted bits        (models/stereo.py)
      -> exact candidate grid search + realize  (models/subframe.py)
      -> channel assignment argmin              (models/stereo.py)
      -> field assembly, bit-pack, CRCs         (models/frame.py)
      -> [B, W] packed words + lengths

The host assembler slices the padded word buffers and concatenates frames
in order; MD5 runs on the host (hashlib) overlapping device compute; the
STREAMINFO block is back-patched at finish exactly like update_metadata_
(stream_encoder.c:3139-3300).
"""

from __future__ import annotations

import bisect
import functools
import hashlib
import io
import struct

import jax
import jax.numpy as jnp
import numpy as np

from . import format as fmt
from .config import EncoderConfig
from .models import frame as frame_mod
from .models import stereo as stereo_mod
from .models import subframe as subframe_mod
from .ops import bitpack
from .ops import lpc as lpc_ops
from .utils.bits import BitWriter


@functools.lru_cache(maxsize=None)
def _bank_for(cfg: EncoderConfig, blocksize: int):
    return lpc_ops.build_apodization_bank(blocksize, cfg.apodizations)


@functools.partial(jax.jit, static_argnames=("cfg", "blocksize", "layout"))
def encode_batch(pcm, first_frame_number, cfg: EncoderConfig,
                 blocksize: int, layout: str = "auto"):
    """Encode a batch of equal-size blocks into packed FLAC frames.

    pcm: [B, C, N] int32 (N == blocksize)
    first_frame_number: scalar int — frame index of pcm[0]
    layout: frame.assemble_frames pack layout ("auto" = fused-quad when
    eligible; frames it can't represent come back ok=False and the host
    re-encodes them with layout="safe" — see StreamEncoder._write_frames).
    Returns frame_mod.PackedFrames.
    """
    B = pcm.shape[0]
    bank = _bank_for(cfg, blocksize)
    x, bps_eff, wasted = stereo_mod.build_channel_candidates(pcm, cfg)
    choice = subframe_mod.search_and_realize(x, bps_eff, wasted, cfg, bank)
    if pcm.shape[1] == 2 and cfg.do_mid_side:
        if cfg.loose_mid_side:
            assignment, ch_index = stereo_mod.loose_assignment(pcm, cfg)
        else:
            assignment, ch_index = stereo_mod.select_assignment(
                choice.bits, cfg)
        choice = stereo_mod.gather_channels(choice, ch_index)
        signal = stereo_mod.gather_channels(x, ch_index)
    else:
        assignment = jnp.zeros((B,), jnp.int32)
        signal = x
    if cfg.limit_min_bitrate:
        # force the last subframe of an all-constant frame to verbatim so
        # frames never shrink to a few bytes (stream_encoder.c:3874-3879)
        all_const = jnp.all(
            choice.type_ == fmt.SUBFRAME_TYPE_CONSTANT, axis=1)
        last = choice.type_.shape[1] - 1
        new_type = choice.type_.at[:, last].set(jnp.where(
            all_const, fmt.SUBFRAME_TYPE_VERBATIM, choice.type_[:, last]))
        choice = choice._replace(type_=new_type)
    frame_numbers = first_frame_number + jnp.arange(B, dtype=jnp.int64)
    return frame_mod.assemble_frames(choice, signal, assignment,
                                     frame_numbers, cfg, blocksize,
                                     layout=layout)


@functools.partial(jax.jit, static_argnames=("cfg", "blocksize"))
def _encode_batch_safe_jit(pcm, first_frame_number, cfg: EncoderConfig,
                           blocksize: int):
    """Jitted safe-layout encode for misfit re-encoding (one compile per
    pow2 batch bucket; the un-jitted op-by-op form costs seconds per
    frame through a tunneled chip)."""
    return encode_batch(pcm, first_frame_number, cfg, blocksize,
                        layout="safe")


@functools.partial(jax.jit, static_argnames=("cfg", "blocksize",
                                              "fetch_words"))
def encode_batch_trimmed(pcm, first_frame_number, cfg: EncoderConfig,
                         blocksize: int, fetch_words: int):
    """encode_batch shaped for cheap device->host moves on a remote chip.

    The padded pow2 word rows bound ~3x the compressed size, and on a
    tunneled chip the fetch is the bottleneck.  Data-dependent device-side
    compaction is NOT the answer: XLA lowers both scatter and cross-row
    gather to serialized element ops on TPU (measured ~40x the rest of the
    encode step).  Instead the word buffer is split by a STATIC slice at
    `fetch_words` (sized to cover typical compressed frames): the host
    always fetches `main` — per-frame byte lengths in column 0, then each
    frame's first fetch_words words — and touches `rest` only for the rare
    frame that compressed above the trim point.  Slicing frames out of the
    padded rows is host work (native C++ gather_frames).

    pcm: [B, C, N] integer blocks (int16 accepted and widened on-device so
         16-bit sources transfer at half width).
    Returns (main [B, 1+fetch_words] uint32, rest [B, W-fetch_words]).
    """
    packed = encode_batch(pcm.astype(jnp.int32), first_frame_number, cfg,
                          blocksize)
    lens = packed.byte_len.astype(jnp.uint32)    # [B]
    # bit 30 flags a quad-layout misfit (host re-encodes that frame)
    lens = jnp.where(packed.ok, lens, lens | jnp.uint32(1 << 30))
    W = packed.words.shape[1]
    fw = min(fetch_words, W)
    main = jnp.concatenate([lens[:, None], packed.words[:, :fw]], axis=1)
    rest = packed.words[:, fw:]
    return main, rest


@jax.jit
def _flag_lens(byte_len, ok):
    """Mark quad-layout misfit frames with bit 30 of the fetched length."""
    return jnp.where(ok, byte_len, byte_len | (1 << 30))


@functools.partial(jax.jit, static_argnames=("widen",))
def encode_widen(pcm16, widen: bool):
    """Device-side int16 -> int32 widen so 16-bit sources cross the link at
    half width (kept out of encode_batch so its trace stays dtype-stable)."""
    return pcm16.astype(jnp.int32) if widen else pcm16


@jax.jit
def _concat_lens(lens_list):
    return jnp.concatenate(lens_list, axis=0)


@functools.partial(jax.jit, static_argnames=("k",))
def _slice_concat(words_list, k: int):
    """Stack per-batch word rows trimmed to k words — one trivial
    executable per (G, 256-word bucket of k), so the big fetch moves ~the
    compressed bytes instead of the padded rows."""
    return jnp.concatenate([w[:, :k] for w in words_list], axis=0)


class _SuperJob:
    """An in-flight super-chunk: lengths fetch -> exact slice fetch.

    Holds the padded per-frame word rows of several batches ON DEVICE; only
    the byte lengths come back eagerly (tiny).  Once lengths land, one
    256-word-bucketed slice-concat fetch moves ~the compressed bytes in a
    single big transfer.  Two transfers per super-chunk instead of one per
    batch keeps the tunnel link free: RPC chatter is what collapses the
    measured device->host bandwidth from ~59 MB/s to ~21 MB/s when
    dispatches interleave with transfers.
    """

    __slots__ = ("enc", "words_list", "lens_fut", "lens", "mb", "N", "base",
                 "blocks", "slice_fut", "bad")

    def __init__(self, enc, words_list, lens_fut, mb, N, base, blocks):
        self.enc = enc
        self.words_list = words_list
        self.lens_fut = lens_fut
        self.lens = None
        self.mb = mb
        self.N = N
        self.base = base
        self.blocks = blocks
        self.slice_fut = None
        self.bad = None

    def poll(self):
        """Start the slice fetch as soon as lengths are available."""
        if self.slice_fut is None and self.lens_fut.done():
            self._start_slice()

    def _start_slice(self):
        lens = np.asarray(self.lens_fut.result())[:self.mb].astype(np.int64)
        self.bad = lens >= (1 << 30)     # quad-layout misfit flags
        self.lens = lens & ((1 << 30) - 1)
        kw = (int(self.lens.max()) + 3) // 4
        kb = min(-(-kw // 256) * 256, self.words_list[0].shape[1])
        ws = _slice_concat(tuple(self.words_list), kb)
        try:
            ws.copy_to_host_async()
        except AttributeError:
            pass
        self.slice_fut = self.enc._fetch_pool.submit(np.asarray, ws)
        self.words_list = None            # release the padded device rows

    def wait(self):
        if self.slice_fut is None:
            self._start_slice()
        return self.slice_fut.result(), self.lens


def default_fetch_words(N: int, C: int, bps: int) -> int:
    """Trim point for encode_batch_trimmed: generous vs typical compression
    (~0.5-0.8 of raw for real audio) so remainder fetches stay rare, far
    below the pow2-padded worst case."""
    raw_words = (N * C * bps + 31) // 32
    return (raw_words * 7) // 8 + 64


def _md5_bytes_per_sample(bps: int) -> int:
    return (bps + 7) // 8


def interleave_for_md5(pcm: np.ndarray, bps: int) -> bytes:
    """Interleave [C, N] int32 -> little-endian signed bytes/sample stream
    (FLAC__MD5Accumulate, md5.c:388-520)."""
    C, N = pcm.shape
    nb = _md5_bytes_per_sample(bps)
    inter = np.ascontiguousarray(pcm.T.astype(np.int32))   # [N, C]
    if nb == 4:
        return inter.tobytes()
    le = inter.astype("<i4").view(np.uint8).reshape(N, C, 4)
    return np.ascontiguousarray(le[:, :, :nb]).tobytes()


class StreamInfo:
    """STREAMINFO metadata block (format.h:536-544)."""

    def __init__(self, cfg: EncoderConfig):
        self.min_blocksize = cfg.blocksize
        self.max_blocksize = cfg.blocksize
        self.min_framesize = (1 << 24) - 1
        self.max_framesize = 0
        self.sample_rate = cfg.sample_rate
        self.channels = cfg.channels
        self.bits_per_sample = cfg.bits_per_sample
        self.total_samples = 0
        self.md5 = b"\x00" * 16

    def to_bytes(self) -> bytes:
        bw = BitWriter()
        bw.write(self.min_blocksize, 16)
        bw.write(self.max_blocksize, 16)
        bw.write(self.min_framesize if self.max_framesize else 0, 24)
        bw.write(self.max_framesize, 24)
        bw.write(self.sample_rate, 20)
        bw.write(self.channels - 1, 3)
        bw.write(self.bits_per_sample - 1, 5)
        bw.write(self.total_samples, 36)
        bw.write_bytes(self.md5)
        return bw.getvalue()


def metadata_block_header(block_type: int, length: int,
                          is_last: bool) -> bytes:
    return struct.pack(">I", ((1 if is_last else 0) << 31)
                       | (block_type << 24) | length)


class StreamEncoder:
    """Host-side streaming encoder: buffers PCM, dispatches device batches,
    assembles the byte stream, back-patches STREAMINFO at finish.

    The emit path is a three-stage pipeline (the TPU analogue of the
    reference's worker pool + ordered bitbuffer drain + md5_fifo,
    stream_encoder.c:3490-3686): batches are dispatched to the device
    asynchronously with their dense results fetched via copy_to_host_async,
    up to `pipeline_depth` batches stay in flight while the host writes
    earlier batches in order, and MD5 runs on a worker thread off the
    critical path."""

    def __init__(self, out, cfg: EncoderConfig, *, batch_frames: int = 64,
                 padding: int = 4096, extra_metadata: list | None = None,
                 seektable=None, verify: bool = False,
                 pipeline_depth: int = 6, super_batches: int = 8,
                 progress_callback=None):
        self.out = out
        self.cfg = cfg.resolve()
        self.batch_frames = batch_frames
        self.verify = verify
        self.blocksize = self.cfg.blocksize
        self._buf = np.zeros((self.cfg.channels, 0), np.int32)
        self._frame_number = 0
        from . import native
        self._native = native if native.AVAILABLE else None
        self._md5 = native.MD5() if self._native else hashlib.md5()
        self._info = StreamInfo(self.cfg)
        self._header_pos = None
        self._seektable = seektable       # SeekTableBlock template or None
        self._seektable_pos = None        # file offset of its body
        self._frame_index = []            # (first_sample, offset, blocksize)
        self._first_frame_offset = None
        self._pipeline_depth = max(1, pipeline_depth)
        self._super_batches = max(1, super_batches)
        # super-chunks in flight: governed by pipeline_depth (each holds
        # super_batches dispatched batches' word buffers on device)
        self._super_depth = max(2, self._pipeline_depth)
        self._inflight = []               # FIFO of dispatched batches
        # Device->host copies over the tunnel run at ~28 MB/s serially but
        # ~52 MB/s when several are in flight (the link multiplexes); a
        # small pool fetches batches concurrently while writes stay ordered
        from concurrent.futures import ThreadPoolExecutor
        # 3 concurrent data fetches + 1 slot so a blocking lengths fetch
        # (waits on device compute) can't starve the slice fetches
        self._fetch_pool = ThreadPoolExecutor(max_workers=4)
        self._progress = progress_callback
        self._bytes_written = 0
        self._md5_queue, self._md5_thread, self._md5_err = None, None, None
        self._start_md5_worker()
        self._write_stream_header(padding, extra_metadata or [])

    def _start_md5_worker(self):
        """MD5 fifo thread (the reference's md5_fifo analogue,
        stream_encoder.c:3575-3686): hashing never blocks device work."""
        import queue
        import threading

        self._md5_queue = queue.Queue(maxsize=8)

        def run():
            while True:
                pcm = self._md5_queue.get()
                if pcm is None:
                    return
                try:
                    if self._native:
                        self._md5.update_pcm(pcm, self.cfg.bits_per_sample)
                    else:
                        self._md5.update(interleave_for_md5(
                            pcm, self.cfg.bits_per_sample))
                except Exception as e:           # surfaced at finish()
                    self._md5_err = e

        self._md5_thread = threading.Thread(target=run, daemon=True)
        self._md5_thread.start()

    def _write_stream_header(self, padding: int, extra: list):
        self.out.write(fmt.STREAM_SYNC_STRING)
        self._header_pos = self.out.tell()
        si = self._info.to_bytes()
        is_last = padding <= 0 and not extra and self._seektable is None
        self.out.write(metadata_block_header(
            fmt.METADATA_TYPE_STREAMINFO, len(si), is_last))
        self.out.write(si)
        if self._seektable is not None:
            # reserve the full table now; patched at finish like the
            # reference's update_metadata_ (stream_encoder.c:3139-3300)
            body = self._seektable.to_bytes()
            last = padding <= 0 and not extra
            self.out.write(metadata_block_header(
                fmt.METADATA_TYPE_SEEKTABLE, len(body), last))
            self._seektable_pos = self.out.tell()
            self.out.write(body)
        for i, blk in enumerate(extra):
            last = (padding <= 0) and i == len(extra) - 1
            self.out.write(metadata_block_header(blk[0], len(blk[1]), last))
            self.out.write(blk[1])
        if padding > 0:
            self.out.write(metadata_block_header(
                fmt.METADATA_TYPE_PADDING, padding, True))
            self.out.write(b"\x00" * padding)
        self._first_frame_offset = self.out.tell()

    def process(self, pcm: np.ndarray):
        """pcm: [C, n] int32 interleaved-by-channel samples."""
        assert pcm.shape[0] == self.cfg.channels
        pcm = np.ascontiguousarray(pcm, np.int32)
        self._md5_queue.put(pcm)
        self._info.total_samples += pcm.shape[1]
        self._buf = np.concatenate([self._buf, pcm], axis=1)
        self._drain(final=False)

    def _drain(self, final: bool):
        N = self.blocksize
        B = self.batch_frames
        while True:
            if final:
                avail = self._buf.shape[1] // N
            else:
                # keep >= 1 sample beyond the last full block so the final
                # (possibly short) block is only emitted at finish
                # (OVERREAD_ buffering, stream_encoder.c:2554-2565)
                avail = max(0, (self._buf.shape[1] - 1) // N)
            if avail == 0:
                break
            if avail >= B:
                # full batches ride the super-chunk path: one upload per
                # up to `super_batches` batches, per-batch device slices
                mb = min(avail // B, self._super_batches) * B
                chunk = self._buf[:, :mb * N]
                self._buf = self._buf[:, mb * N:]
                blocks = chunk.reshape(self.cfg.channels, mb, N).transpose(
                    1, 0, 2)
                self._emit_super(blocks, N)
                continue
            nb = min(avail, B)
            chunk = self._buf[:, :nb * N]
            self._buf = self._buf[:, nb * N:]
            blocks = chunk.reshape(self.cfg.channels, nb, N).transpose(
                1, 0, 2)
            self._emit(blocks, N)
        if final and self._buf.shape[1] > 0:
            blocks = self._buf.reshape(self.cfg.channels, 1, -1).transpose(
                1, 0, 2)
            self._emit(blocks, self._buf.shape[1])
            self._buf = self._buf[:, :0]

    def _emit_super(self, blocks: np.ndarray, N: int):
        """blocks: [G*B, C, N] int32, G >= 1 full batches — per-batch
        dispatches whose padded word rows STAY on device; only the lengths
        and one exact bucketed slice-concat come back (see _SuperJob)."""
        B = self.batch_frames
        mb, C, _ = blocks.shape
        G = mb // B
        narrow = self.cfg.bits_per_sample <= 16
        words_list, lens_list = [], []
        for g in range(G):
            sub = blocks[g * B:(g + 1) * B]
            dev = jax.device_put(sub.astype(np.int16) if narrow else sub)
            pf = encode_batch(encode_widen(dev, narrow),
                              np.int64(self._frame_number + g * B),
                              self.cfg, N)
            words_list.append(pf.words)
            lens_list.append(_flag_lens(pf.byte_len, pf.ok))
            self._poll_supers()
        lens = _concat_lens(tuple(lens_list)) if G > 1 else lens_list[0]
        try:
            lens.copy_to_host_async()
        except AttributeError:
            pass
        lens_fut = self._fetch_pool.submit(np.asarray, lens)
        job = _SuperJob(self, words_list, lens_fut, mb, N,
                        self._frame_number, blocks)
        self._inflight.append(("s", job))
        self._frame_number += mb
        self._poll_supers()
        while len(self._inflight) > self._super_depth:
            self._drain_one_inflight()

    def _poll_supers(self):
        for entry in self._inflight:
            if entry[0] == "s":
                entry[1].poll()

    def _emit(self, blocks: np.ndarray, N: int):
        """blocks: [B, C, N] int32 — dispatch one batch, keep the pipeline
        at most `pipeline_depth` deep."""
        B, C, _ = blocks.shape
        # 16-bit sources cross the host->device link at half width
        upload = blocks.astype(np.int16) \
            if self.cfg.bits_per_sample <= 16 else blocks
        fw = default_fetch_words(N, C, self.cfg.bits_per_sample)
        main, rest = encode_batch_trimmed(jax.device_put(upload),
                                          np.int64(self._frame_number),
                                          self.cfg, N, fw)
        try:
            main.copy_to_host_async()
        except AttributeError:          # non-jax array in exotic backends
            pass
        fut = self._fetch_pool.submit(np.asarray, main)
        self._inflight.append(
            ("b", fut, rest, blocks, B, N, self._frame_number))
        self._frame_number += B
        self._poll_supers()
        while len(self._inflight) > self._pipeline_depth:
            self._drain_one_inflight()

    def _drain_one_inflight(self):
        self._poll_supers()
        entry = self._inflight.pop(0)
        if entry[0] == "s":
            job = entry[1]
            buf, lens = job.wait()
            B, N, base_frame, blocks = job.mb, job.N, job.base, job.blocks
            bad = job.bad
            wbytes = buf[:B].astype(">u4", order="C").view(np.uint8) \
                .reshape(B, -1)
            if int(lens.max()) > wbytes.shape[1]:
                # mirror of the per-batch path's loud overflow guard: a
                # frame longer than the padded word rows would silently
                # truncate in _write_frames' row slicing
                raise RuntimeError(
                    f"frame exceeded super-chunk fetch buffer: "
                    f"{int(lens.max())} > {wbytes.shape[1]} (encoder bug)")
            self._poll_supers()
            self._write_frames(wbytes, lens, blocks, B, N, base_frame,
                               bad=bad)
            return
        _, fut, rest, blocks, B, N, base_frame = entry
        buf = fut.result()
        lens = buf[:, 0].astype(np.int64)
        bad = lens >= (1 << 30)
        lens = lens & ((1 << 30) - 1)
        fw = buf.shape[1] - 1
        wbytes = buf[:, 1:].astype(">u4", order="C").view(np.uint8) \
            .reshape(B, -1)
        if int(lens.max()) > 4 * fw:
            # rare: a frame compressed above the trim point — splice the
            # remainder words in (one extra fetch for this batch only)
            restb = np.asarray(rest).astype(">u4", order="C") \
                .view(np.uint8).reshape(B, -1)
            wbytes = np.concatenate([wbytes, restb], axis=1)
            if int(lens.max()) > wbytes.shape[1]:
                # structurally impossible (pow2 buffer bounds verbatim);
                # fail loudly rather than emit a truncated stream
                raise RuntimeError(
                    f"frame exceeded worst-case pack buffer: "
                    f"{int(lens.max())} > {wbytes.shape[1]} (encoder bug)")
        self._write_frames(wbytes, lens, blocks, B, N, base_frame, bad=bad)

    def _replace_bad_frames(self, wbytes, lens, blocks, bad, N,
                            base_frame):
        """Re-encode quad-layout misfit frames through the exact safe
        layout (one-field-per-sample pack) and splice them in.  Misfits
        are BATCHED into pow2 buckets — transient-heavy content can flag
        hundreds of frames per super-chunk, and a per-frame B=1 dispatch
        multiplies the round trips (measured 10x whole-encode collapse
        on a click corpus).  Frame numbers stay per-frame via an array
        first_frame_number (encode_batch adds arange(B))."""
        if blocks is None:
            raise RuntimeError(
                "flagged frames but no retained blocks (encoder bug)")
        lens = np.array(lens, np.int64, copy=True)
        rows = {}
        maxlen = int(lens.max())
        bad_idx = [int(i) for i in np.nonzero(bad)[0]]
        B = len(blocks)
        if len(bad_idx) > max(8, B // 8):
            # dense misfits (transient/click content can flag >half the
            # batch): one full-batch safe re-encode beats splicing —
            # the quad layout's "rare misfit" premise doesn't hold here
            pf = _encode_batch_safe_jit(
                jnp.asarray(blocks.astype(np.int32)),
                np.int64(base_frame), self.cfg, N)
            ws = np.asarray(pf.words)
            wbytes2 = np.ascontiguousarray(ws).astype(">u4") \
                .view(np.uint8).reshape(B, -1)
            return wbytes2, np.asarray(pf.byte_len).astype(np.int64)
        pos = 0
        while pos < len(bad_idx):
            take = bad_idx[pos:pos + 128]
            pos += len(take)
            nb = max(1, 1 << (len(take) - 1).bit_length())
            sel = np.stack([blocks[i] for i in take]
                           + [blocks[take[-1]]] * (nb - len(take)))
            # per-frame numbers: pass (number_i - i) so the kernel's
            # +arange(B) lands each frame on its real number
            nums = np.asarray(
                [base_frame + i for i in take]
                + [base_frame + take[-1]] * (nb - len(take)), np.int64)
            nums = nums - np.arange(nb, dtype=np.int64)
            pf = _encode_batch_safe_jit(
                jnp.asarray(sel.astype(np.int32)),
                jnp.asarray(nums), self.cfg, N)
            ws = np.asarray(pf.words)
            lns = np.asarray(pf.byte_len)
            for j, i in enumerate(take):
                ln = int(lns[j])
                rows[i] = (np.ascontiguousarray(ws[j]).astype(">u4")
                           .view(np.uint8), ln)
                maxlen = max(maxlen, ln)
        if maxlen > wbytes.shape[1]:
            wbytes = np.pad(wbytes, ((0, 0), (0, maxlen - wbytes.shape[1])))
        elif not wbytes.flags.writeable:
            wbytes = wbytes.copy()
        for i, (rb, ln) in rows.items():
            wbytes[i, :ln] = rb[:ln]
            lens[i] = ln
        return wbytes, lens

    def _write_frames(self, wbytes, lens, blocks, B, N, base_frame,
                      bad=None):
        if bad is not None and bad.any():
            wbytes, lens = self._replace_bad_frames(
                wbytes, lens, blocks, bad, N, base_frame)
        if self._native:
            blob = self._native.gather_frames(wbytes, lens)
        else:
            blob = b"".join(wbytes[i, :int(lens[i])].tobytes()
                            for i in range(B))
        if self.verify:
            self._verify_batch(blocks, blob, lens, N, base_frame)
        if self._seektable is not None:
            base = self.out.tell() - self._first_frame_offset
            offs = base + np.concatenate([[0], np.cumsum(lens[:-1])])
            for i in range(B):
                self._frame_index.append(
                    ((base_frame + i) * self.blocksize, int(offs[i]), N))
        if hasattr(self.out, "write_frames"):
            # container sinks (Ogg) that packetize per frame take the
            # batch with its length table instead of raw bytes
            self.out.write_frames(blob, lens, N)
        else:
            self.out.write(blob)
        self._bytes_written += len(blob)
        self._info.min_framesize = min(self._info.min_framesize,
                                       int(lens.min()))
        self._info.max_framesize = max(self._info.max_framesize,
                                       int(lens.max()))
        if self._progress is not None:
            self._progress(base_frame + B, self.blocksize,
                           self._bytes_written)

    def _verify_batch(self, blocks: np.ndarray, blob: bytes,
                      lens: np.ndarray, N: int, base_frame: int):
        """Encoder verify loopback (`-V`, stream_encoder.c:1287-1325,
        2334-2352): decode every emitted frame and compare sample-exactly
        against the input before any byte reaches the output."""
        from .decoder import decode_frame_list, parse_frame_header
        from .ref_decoder import DecodedStream
        B = lens.shape[0]
        st = DecodedStream()
        st.sample_rate = self.cfg.sample_rate
        st.channels = self.cfg.channels
        st.bits_per_sample = self.cfg.bits_per_sample
        # frame boundaries are exactly the emitted lengths — parse each
        # header in place rather than re-scanning for sync
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        frames = []
        for i in range(B):
            h = parse_frame_header(blob, int(offs[i]), st)
            if h is None:
                raise RuntimeError(
                    f"verify: emitted frame {base_frame + i} has "
                    "an invalid header (encoder bug)")
            h["size"] = int(lens[i])
            frames.append(h)
        from .ref_decoder import FlacDecodeError
        try:
            decoded = decode_frame_list(blob, st, frames)
        except FlacDecodeError as e:
            raise RuntimeError(
                f"verify: emitted frames fail to decode ({e}; stream NOT "
                "written)") from e
        for i, sig in enumerate(decoded):
            if not np.array_equal(sig, blocks[i]):
                bad = np.nonzero(sig != blocks[i])
                raise RuntimeError(
                    "verify mismatch in audio data: frame "
                    f"{base_frame + i}, channel {int(bad[0][0])}, "
                    f"sample {int(bad[1][0])} (stream NOT written)")

    def _resolve_seektable(self):
        """Fill template points with real frame positions (the encoder-side
        seekpoint resolution of write_frame_/update_metadata_)."""
        from .metadata import SeekPoint
        resolved, seen = [], set()
        fidx = self._frame_index
        starts = [f[0] for f in fidx]
        for p in self._seektable.points:
            if p.sample_number == fmt.SEEKPOINT_PLACEHOLDER or not fidx:
                continue
            i = bisect.bisect_right(starts, min(p.sample_number,
                                                self._info.total_samples - 1))
            i = max(0, i - 1)
            fs, off, bs = fidx[i]
            if fs not in seen:
                seen.add(fs)
                resolved.append(SeekPoint(fs, off, bs))
        resolved.sort(key=lambda p: p.sample_number)
        pad = len(self._seektable.points) - len(resolved)
        resolved += [SeekPoint(fmt.SEEKPOINT_PLACEHOLDER, 0, 0)] * pad
        self._seektable.points = resolved

    def close(self):
        """Release worker threads.  Safe to call repeatedly; error paths
        that abandon the encoder before finish() must not leak the fetch
        pool or the MD5 worker."""
        self._fetch_pool.shutdown(wait=False, cancel_futures=True)
        if self._md5_thread is not None and self._md5_thread.is_alive():
            self._md5_queue.put(None)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        self.close()
        return False

    def finish(self):
        self._drain(final=True)
        while self._inflight:
            self._drain_one_inflight()
        self._md5_queue.put(None)
        self._md5_thread.join()
        self._fetch_pool.shutdown(wait=False)
        if self._md5_err is not None:
            raise self._md5_err
        self._info.md5 = self._md5.digest()
        if self.out.seekable():
            pos = self.out.tell()
            self.out.seek(self._header_pos + 4)
            self.out.write(self._info.to_bytes())
            if self._seektable is not None:
                self._resolve_seektable()
                self.out.seek(self._seektable_pos)
                self.out.write(self._seektable.to_bytes())
            self.out.seek(pos)
        return self._info


def encode_file_to_flac(pcm: np.ndarray, cfg: EncoderConfig,
                        out=None, **kw) -> bytes:
    """Convenience one-shot: pcm [C, n] int32 -> FLAC byte stream."""
    buf = out or io.BytesIO()
    with StreamEncoder(buf, cfg, **kw) as enc:
        enc.process(pcm)
        enc.finish()
    return buf.getvalue() if out is None else None
