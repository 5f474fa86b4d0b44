"""Metadata object/chain tests, modeled on the reference's
test_libFLAC metadata_object/metadata_manip suites."""

import numpy as np
import pytest

from flac_tpu import EncoderConfig, encode_file_to_flac
from flac_tpu import metadata as md
from flac_tpu import format as fmt
from tests.conftest import make_test_signal


def make_flac():
    pcm = make_test_signal(8192)
    return encode_file_to_flac(pcm, EncoderConfig.from_preset(5),
                               batch_frames=2), pcm


def test_chain_read_roundtrip():
    data, pcm = make_flac()
    chain = md.Chain.read(data)
    assert chain.streaminfo.sample_rate == 44100
    assert chain.streaminfo.total_samples == 8192
    out = chain.write()
    # unmodified chain serializes to identical bytes
    assert out == data


def test_vorbis_comment_edit_preserves_audio():
    data, pcm = make_flac()
    chain = md.Chain.read(data)
    vc = md.VorbisCommentBlock()
    vc.set("TITLE", "Test Track")
    vc.set("ARTIST", "flac_tpu")
    chain.blocks.insert(1, vc)
    out = chain.write()

    chain2 = md.Chain.read(out)
    vc2 = chain2.get(fmt.METADATA_TYPE_VORBIS_COMMENT)
    assert vc2.get("TITLE") == ["Test Track"]
    assert vc2.get("ARTIST") == ["flac_tpu"]

    from flac_tpu.ref_decoder import decode_stream
    st = decode_stream(out)
    assert np.array_equal(st.samples, pcm)


def test_padding_reuse_keeps_size():
    data, _ = make_flac()
    chain = md.Chain.read(data)
    vc = md.VorbisCommentBlock()
    vc.set("X", "y" * 100)
    chain.blocks.insert(1, vc)
    out = chain.write()
    # fits in existing padding -> same total size
    assert len(out) == len(data)


def test_vorbis_comment_ops():
    vc = md.VorbisCommentBlock()
    vc.set("GENRE", "noise")
    vc.set("genre", "drone", replace_all=True)
    assert vc.get("GENRE") == ["drone"]
    vc.set("GENRE", "both", replace_all=False)
    assert len(vc.get("GENRE")) == 2
    assert vc.remove("GENRE") == 2
    assert vc.get("GENRE") == []
    blob = vc.to_bytes()
    assert md.VorbisCommentBlock.parse(blob).comments == vc.comments


def test_seektable_legal():
    st = md.SeekTableBlock(points=[
        md.SeekPoint(0, 0, 4096), md.SeekPoint(44100, 1234, 4096),
        md.SeekPoint(fmt.SEEKPOINT_PLACEHOLDER, 0, 0)])
    assert st.is_legal()
    st_bad = md.SeekTableBlock(points=[
        md.SeekPoint(100, 0, 0), md.SeekPoint(50, 0, 0)])
    assert not st_bad.is_legal()
    assert md.SeekTableBlock.parse(st.to_bytes()).points == st.points


def test_picture_roundtrip():
    pic = md.PictureBlock(picture_type=3, mime_type="image/png",
                          description="cover", width=2, height=2, depth=24,
                          data=b"\x89PNG fake")
    out = md.PictureBlock.parse(pic.to_bytes())
    assert out == pic


def test_cuesheet_roundtrip():
    cs = md.CueSheetBlock(
        media_catalog_number=b"1234567890123".ljust(128, b"\x00"),
        lead_in=88200, is_cd=True,
        tracks=[md.CueSheetTrack(
            offset=0, number=1, isrc=b"ABCDE1234567", is_audio=True,
            indices=[md.CueSheetTrackIndex(0, 1)]),
            md.CueSheetTrack(offset=44100 * 60, number=170)])
    out = md.CueSheetBlock.parse(cs.to_bytes())
    assert out == cs


def test_metaflac_cli(tmp_path):
    data, _ = make_flac()
    f = tmp_path / "x.flac"
    f.write_bytes(data)
    from flac_tpu.metaflac_cli import main
    assert main(["--set-tag=TITLE=hello", str(f)]) == 0
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["--show-tag=TITLE", str(f)]) == 0
    assert buf.getvalue().strip() == "TITLE=hello"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["--show-sample-rate", str(f)]) == 0
    assert buf.getvalue().strip() == "44100"
    # audio survives the in-place edit
    from flac_tpu.ref_decoder import decode_stream
    decode_stream(f.read_bytes())


def _mk_flac(tmp_path, tags=()):
    from flac_tpu import EncoderConfig
    from flac_tpu.encoder import encode_file_to_flac
    from flac_tpu import metadata as md
    from tests.conftest import make_test_signal
    pcm = make_test_signal(8192)
    extra = []
    if tags:
        vc = md.VorbisCommentBlock()
        vc.comments.extend(tags)
        extra.append((vc.TYPE, vc.to_bytes()))
    stream = encode_file_to_flac(pcm, EncoderConfig.from_preset(2),
                                 extra_metadata=extra)
    p = tmp_path / "t.flac"
    p.write_bytes(stream)
    return p


def test_metaflac_set_tag_from_file(tmp_path):
    from flac_tpu import metaflac_cli, metadata as md, format as fmt
    p = _mk_flac(tmp_path)
    val = tmp_path / "lyrics.txt"
    val.write_text("line one\nline two\n")
    assert metaflac_cli.main([f"--set-tag-from-file=LYRICS={val}",
                              str(p)]) == 0
    vc = md.Chain.read_file(str(p)).get(fmt.METADATA_TYPE_VORBIS_COMMENT)
    assert vc.get("LYRICS") == ["line one\nline two"]


def test_metaflac_block_number_remove(tmp_path):
    from flac_tpu import metaflac_cli, metadata as md
    p = _mk_flac(tmp_path, tags=["A=1"])
    before = md.Chain.read_file(str(p)).blocks
    # block #1 is the vorbis comment (inserted right after STREAMINFO)
    assert metaflac_cli.main(["--remove", "--block-number=1", str(p)]) == 0
    after = md.Chain.read_file(str(p)).blocks
    assert len(after) == len(before) - 1
    types_before = [b.TYPE for b in before]
    types_after = [b.TYPE for b in after]
    assert types_before[1] not in types_after or \
        types_before.count(types_before[1]) > 1


def test_metaflac_append_and_streaminfo_setters(tmp_path, monkeypatch):
    import io
    import sys as _sys
    from flac_tpu import metaflac_cli, metadata as md, format as fmt
    p = _mk_flac(tmp_path)
    # binary APPLICATION block on stdin
    body = b"xmpl" + b"hello world"
    raw = md.block_header(fmt.METADATA_TYPE_APPLICATION, len(body), False) \
        + body
    monkeypatch.setattr(_sys, "stdin",
                        type("S", (), {"buffer": io.BytesIO(raw)})())
    assert metaflac_cli.main(["--append", str(p)]) == 0
    chain = md.Chain.read_file(str(p))
    app = chain.get(fmt.METADATA_TYPE_APPLICATION)
    assert app is not None and app.app_id == b"xmpl"
    # streaminfo setter
    assert metaflac_cli.main(
        ["--set-md5sum=" + "ab" * 16, str(p)]) == 0
    assert md.Chain.read_file(str(p)).streaminfo.md5 == b"\xab" * 16


def test_metaflac_list_binary_roundtrip(tmp_path, capsysbinary):
    from flac_tpu import metaflac_cli
    p = _mk_flac(tmp_path, tags=["X=y"])
    assert metaflac_cli.main(["--list", "--data-format=binary",
                              str(p)]) == 0
    out = capsysbinary.readouterr().out
    data = p.read_bytes()
    # the dumped blocks are exactly the file's metadata section
    assert out == data[4:4 + len(out)]


# ---------------------------------------------------------------------------
# Level-1 SimpleIterator (metadata.h:374-663): in-place edits, padding
# absorption, O(1) delete — the audio frames must never be rewritten
# unless the metadata region actually has to change size.
# ---------------------------------------------------------------------------

def _frames_bytes(path):
    data = path.read_bytes()
    return data[md.Chain.read(data)._meta_bytes + 4:]


def _types(path):
    return [b.TYPE for b in md.Chain.read_file(str(path)).blocks]


def test_simple_iterator_navigation(tmp_path):
    p = _mk_flac(tmp_path, tags=["A=1"])
    with md.SimpleIterator(str(p), read_only=True) as it:
        assert not it.is_writable()
        assert it.get_block_type() == fmt.METADATA_TYPE_STREAMINFO
        seen = [it.get_block_type()]
        while it.next():
            seen.append(it.get_block_type())
        assert it.is_last()
        assert seen == _types(p)
        while it.prev():
            pass
        assert it.get_block_type() == fmt.METADATA_TYPE_STREAMINFO
        si = it.get_block()
        assert si.sample_rate == 44100


def test_simple_iterator_same_size_edit_in_place(tmp_path):
    p = _mk_flac(tmp_path, tags=["TITLE=aaaa"])
    frames0 = _frames_bytes(p)
    ino0 = p.stat().st_ino
    with md.SimpleIterator(str(p)) as it:
        assert it.next()
        assert it.get_block_type() == fmt.METADATA_TYPE_VORBIS_COMMENT
        vc = it.get_block()
        vc.set("TITLE", "bbbb")         # same byte length
        it.set_block(vc)
    assert p.stat().st_ino == ino0      # no temp-file rewrite happened
    assert _frames_bytes(p) == frames0
    assert md.get_tags(str(p)).get("TITLE") == ["bbbb"]


def test_simple_iterator_grow_into_padding(tmp_path):
    p = _mk_flac(tmp_path, tags=["TITLE=x"])
    size0 = p.stat().st_size
    frames0 = _frames_bytes(p)
    ino0 = p.stat().st_ino
    with md.SimpleIterator(str(p)) as it:
        assert it.next()
        vc = it.get_block()
        vc.set("COMMENT", "y" * 300)    # grows, but padding absorbs it
        it.set_block(vc)
    assert p.stat().st_ino == ino0
    assert p.stat().st_size == size0
    assert _frames_bytes(p) == frames0
    assert md.get_tags(str(p)).get("COMMENT") == ["y" * 300]
    from flac_tpu.ref_decoder import decode_stream
    decode_stream(p.read_bytes())   # raises if MD5 mismatches


def test_simple_iterator_shrink_leaves_padding(tmp_path):
    p = _mk_flac(tmp_path, tags=["TITLE=" + "z" * 200])
    size0 = p.stat().st_size
    with md.SimpleIterator(str(p)) as it:
        assert it.next()
        vc = it.get_block()
        vc.remove("TITLE")
        it.set_block(vc)
    assert p.stat().st_size == size0
    types = _types(p)
    assert types.count(fmt.METADATA_TYPE_PADDING) >= 1


def test_simple_iterator_grow_beyond_padding_shifts_tail(tmp_path):
    p = _mk_flac(tmp_path, tags=["T=a"])
    frames0 = _frames_bytes(p)
    with md.SimpleIterator(str(p)) as it:
        assert it.next()
        vc = it.get_block()
        vc.set("BIG", "q" * 20000)      # larger than the 4096 padding
        it.set_block(vc)
        assert it.get_block_type() == fmt.METADATA_TYPE_VORBIS_COMMENT
    assert _frames_bytes(p) == frames0
    assert md.get_tags(str(p)).get("BIG") == ["q" * 20000]
    from flac_tpu.ref_decoder import decode_stream
    decode_stream(p.read_bytes())   # raises if MD5 mismatches


def test_simple_iterator_delete_is_o1(tmp_path):
    p = _mk_flac(tmp_path, tags=["T=a"])
    size0 = p.stat().st_size
    ino0 = p.stat().st_ino
    with md.SimpleIterator(str(p)) as it:
        assert it.next()
        assert it.get_block_type() == fmt.METADATA_TYPE_VORBIS_COMMENT
        it.delete_block()               # becomes padding, merged
        assert it.get_block_type() == fmt.METADATA_TYPE_STREAMINFO
    assert p.stat().st_ino == ino0      # header-patch only
    assert p.stat().st_size == size0
    assert md.get_tags(str(p)) is None


def test_simple_iterator_delete_without_padding(tmp_path):
    p = _mk_flac(tmp_path, tags=["T=a"])
    size0 = p.stat().st_size
    with md.SimpleIterator(str(p)) as it:
        assert it.next()
        vlen = it.get_block_length()
        it.delete_block(use_padding=False)
    assert p.stat().st_size == size0 - 4 - vlen
    from flac_tpu.ref_decoder import decode_stream
    decode_stream(p.read_bytes())   # raises if MD5 mismatches


def test_simple_iterator_insert_carves_padding(tmp_path):
    p = _mk_flac(tmp_path)
    size0 = p.stat().st_size
    app = md.ApplicationBlock(b"xmpl", b"hello")
    with md.SimpleIterator(str(p)) as it:
        # walk to the block just before the trailing padding
        while not it.is_last():
            if not it.next():
                break
        it.prev()
        it.insert_block_after(app)
        assert it.get_block_type() == fmt.METADATA_TYPE_APPLICATION
    assert p.stat().st_size == size0    # carved from padding
    ch = md.Chain.read_file(str(p))
    got = ch.get(fmt.METADATA_TYPE_APPLICATION)
    assert got is not None and got.app_id == b"xmpl" and got.data == b"hello"


def test_simple_iterator_guards(tmp_path):
    p = _mk_flac(tmp_path)
    with md.SimpleIterator(str(p)) as it:
        with pytest.raises(md.MetadataError):
            it.delete_block()           # cannot delete STREAMINFO
        with pytest.raises(md.MetadataError):
            it.set_block(md.PaddingBlock(8))   # block 0 must stay SI
    with md.SimpleIterator(str(p), read_only=True) as it:
        with pytest.raises(md.MetadataError):
            it.delete_block()


def test_chain_write_file_in_place(tmp_path):
    """Lazy file mode: a padding-absorbed tag edit patches the metadata
    region in place — the audio tail is never rewritten."""
    p = _mk_flac(tmp_path, tags=["T=a"])
    ino0, size0 = p.stat().st_ino, p.stat().st_size
    frames0 = _frames_bytes(p)
    chain = md.Chain.read_file(str(p))
    assert chain._frames is None        # frames stayed on disk
    vc = chain.get(fmt.METADATA_TYPE_VORBIS_COMMENT)
    vc.set("ALBUM", "in-place edit " * 10)
    chain.write_file(str(p))
    st = p.stat()
    assert (st.st_ino, st.st_size) == (ino0, size0)
    assert _frames_bytes(p) == frames0
    assert md.get_tags(str(p)).get("ALBUM") == ["in-place edit " * 10]
    from flac_tpu.ref_decoder import decode_stream
    decode_stream(p.read_bytes())
