"""Adversarial AbcCoreOgawa layouts the repo's own writer NEVER emits.

Round-2 verdict: a reader and writer sharing one wrong assumption about
the bit packing would round-trip green and still fail on a real SDK
archive. These archives are hand-built at the Ogawa byte level (raw
struct packing over OgawaWriter — NOT AbcWriter) to pin the reader
against the published AbcCoreOgawa layout choices our writer avoids:
indexed metadata, multi-sample properties, first/last-changed
bookkeeping words, time-sampling indices, real (nonzero) hash trailers,
explicit dims words, and malformed files that must fail loudly.
"""
import struct

import numpy as np
import pytest

from phosphorus_mk2_tpu.io.abc import ARRAY, SCALAR, AbcReader
from phosphorus_mk2_tpu.io.ogawa import EMPTY_DATA, OgawaWriter

POD_INT32 = 6       # abc._POD_NP values
POD_FLOAT32 = 10


def _name_meta_inline(name: str, meta: str) -> bytes:
    nb = name.encode()
    mb = meta.encode()
    return (struct.pack("<I", len(nb)) + nb
            + bytes([0xFF]) + struct.pack("<I", len(mb)) + mb)


def _name_meta_indexed(name: str, idx: int) -> bytes:
    nb = name.encode()
    return struct.pack("<I", len(nb)) + nb + bytes([idx])


def _prop_info(ptype, pod, extent, num_samples, *, no_repeats=True,
               has_tsidx=False, extra=b"") -> bytes:
    info = ptype & 0x3
    info |= (pod & 0xF) << 2
    if has_tsidx:
        info |= 0x0040
    if no_repeats:
        info |= 0x0080
    info |= (extent & 0xFF) << 8
    out = struct.pack("<I", info) + struct.pack("<I", num_samples)
    return out + extra


def _object(og, props_word, children, child_headers: bytes,
            hash_tail: bytes = bytes(32)) -> int:
    header_word = og.write_data(child_headers + hash_tail)
    return og.write_group([props_word] + children + [header_word])


def _root(og, top_word, indexed_meta: list[bytes] | None = None) -> int:
    idx_payload = b""
    for m in indexed_meta or []:
        idx_payload += bytes([len(m)]) + m
    return og.write_group([
        og.write_data(struct.pack("<I", 0)),
        og.write_data(struct.pack("<I", 10709)),
        top_word,
        og.write_data(b"_ai_Application=adversarial"),
        og.write_data(b""),
        og.write_data(idx_payload) if idx_payload else og.write_data(b""),
    ])


def _sample(arr) -> bytes:
    return bytes(16) + np.ascontiguousarray(arr).tobytes()


def test_indexed_metadata(tmp_path):
    """Child AND property metadata referenced through the root indexed-
    metadata table (index != 0xFF) — our writer always inlines."""
    og = OgawaWriter()
    arr = np.arange(6, dtype=np.float32)
    prop_group = og.write_group([og.write_data(_sample(arr)), EMPTY_DATA])
    headers = _prop_info(ARRAY, POD_FLOAT32, 1, 1)
    headers += _name_meta_indexed("P", 2)  # meta from table entry 2
    props = og.write_group([prop_group, og.write_data(headers)])

    child = _object(og, props, [], b"")
    top = _object(og, 0, [child], _name_meta_indexed("mesh", 1))
    root = _root(og, top, indexed_meta=[
        b"schema=AbcGeom_PolyMesh_v1;schemaObjTitle=AbcGeom_PolyMesh_v1:.geom",
        b"interpretation=special",
    ])
    path = str(tmp_path / "indexed.abc")
    og.save(path, root)

    r = AbcReader(path)
    kids = r.top.children()
    assert [k.name for k in kids] == ["mesh"]
    assert kids[0].schema == "AbcGeom_PolyMesh_v1"
    props = kids[0].properties()
    h, w = props["P"]
    assert h.meta.get("interpretation") == "special"
    np.testing.assert_array_equal(r.sample(props["P"]), arr)


def test_multi_sample_and_bookkeeping_words(tmp_path):
    """num_samples=2 with no_repeats UNSET: the header carries first/
    last-changed words the reader must skip; sample(index=1) must land
    on the second (data, dims) pair."""
    og = OgawaWriter()
    s0 = np.arange(4, dtype=np.float32)
    s1 = np.arange(4, dtype=np.float32) * 10.0
    prop_group = og.write_group([
        og.write_data(_sample(s0)), EMPTY_DATA,
        og.write_data(_sample(s1)), EMPTY_DATA,
    ])
    headers = _prop_info(
        ARRAY, POD_FLOAT32, 1, 2,
        no_repeats=False,
        extra=struct.pack("<II", 1, 1),  # first changed / last changed
    )
    headers += _name_meta_inline("P", "")
    props = og.write_group([prop_group, og.write_data(headers)])
    top = _object(og, props, [], b"")
    path = str(tmp_path / "multisample.abc")
    og.save(path, _root(og, top))

    r = AbcReader(path)
    pr = r.top.properties()
    h, w = pr["P"]
    assert h.num_samples == 2
    np.testing.assert_array_equal(r.sample(pr["P"], 0), s0)
    np.testing.assert_array_equal(r.sample(pr["P"], 1), s1)


def test_tsidx_word_and_scalar(tmp_path):
    """has-tsidx bit set: one extra uint32 before name/meta; scalar POD
    with extent 3 decodes as one row."""
    og = OgawaWriter()
    val = np.array([1.5, 2.5, 3.5], np.float32)
    prop_group = og.write_group([og.write_data(_sample(val))])
    headers = _prop_info(
        SCALAR, POD_FLOAT32, 3, 1, has_tsidx=True,
        extra=struct.pack("<I", 7),  # time sampling index
    )
    headers += _name_meta_inline("S", "")
    props = og.write_group([prop_group, og.write_data(headers)])
    top = _object(og, props, [], b"")
    path = str(tmp_path / "tsidx.abc")
    og.save(path, _root(og, top))

    r = AbcReader(path)
    pr = r.top.properties()
    got = r.sample(pr["S"])
    np.testing.assert_array_equal(got.reshape(-1, 3)[0], val)


def test_nonzero_hash_trailers(tmp_path):
    """Real archives end child-header blocks with nonzero hashes and
    prefix samples with real 16-byte keys; the reader must not misparse
    either as more children / payload."""
    og = OgawaWriter()
    arr = np.arange(3, dtype=np.int32)
    payload = b"\xde\xad\xbe\xef" * 4 + arr.tobytes()  # nonzero sample key
    prop_group = og.write_group([og.write_data(payload), EMPTY_DATA])
    headers = _prop_info(ARRAY, POD_INT32, 1, 1)
    headers += _name_meta_inline("ids", "")
    props = og.write_group([prop_group, og.write_data(headers)])

    inner = _object(og, props, [], b"", hash_tail=bytes(range(32)))
    top = _object(
        og, 0, [inner], _name_meta_inline("child", ""),
        hash_tail=bytes(reversed(range(32))),
    )
    path = str(tmp_path / "hashes.abc")
    og.save(path, _root(og, top))

    r = AbcReader(path)
    kids = r.top.children()
    assert [k.name for k in kids] == ["child"]
    pr = kids[0].properties()
    np.testing.assert_array_equal(r.sample(pr["ids"]), arr)


def test_explicit_dims_word(tmp_path):
    """Array sample with an EXPLICIT rank-1 dims word (our writer emits
    EMPTY_DATA and lets size deduce the rank)."""
    og = OgawaWriter()
    arr = np.arange(12, dtype=np.float32).reshape(4, 3)
    dims = np.array([4], np.uint64)
    prop_group = og.write_group([
        og.write_data(_sample(arr)),
        og.write_data(dims.tobytes()),
    ])
    headers = _prop_info(ARRAY, POD_FLOAT32, 3, 1)
    headers += _name_meta_inline("P", "")
    props = og.write_group([prop_group, og.write_data(headers)])
    top = _object(og, props, [], b"")
    path = str(tmp_path / "dims.abc")
    og.save(path, _root(og, top))

    r = AbcReader(path)
    pr = r.top.properties()
    got = r.sample(pr["P"])
    np.testing.assert_array_equal(got, arr)


def test_malformed_archives_fail_loudly(tmp_path):
    # bad magic
    p1 = str(tmp_path / "bad_magic.abc")
    with open(p1, "wb") as f:
        f.write(b"NotOgawa" + bytes(64))
    with pytest.raises(ValueError, match="magic"):
        AbcReader(p1)

    # unfrozen archive (mid-write flag)
    og = OgawaWriter()
    root = _root(og, _object(og, 0, [], b""))
    buf = bytearray(og.freeze(root))
    buf[5] = 0x00
    p2 = str(tmp_path / "unfrozen.abc")
    with open(p2, "wb") as f:
        f.write(bytes(buf))
    with pytest.raises(ValueError, match="frozen"):
        AbcReader(p2)

    # structurally Ogawa but not Alembic (root too small)
    og = OgawaWriter()
    small_root = og.write_group([og.write_data(b"x")])
    p3 = str(tmp_path / "small_root.abc")
    og.save(p3, small_root)
    with pytest.raises(ValueError, match="not an Alembic archive"):
        AbcReader(p3)


POD_STRING = 12
POD_WSTRING = 13


def test_string_and_wstring_properties(tmp_path):
    """String-POD properties the repo's writer never emits: a scalar
    string, an ARRAY of NUL-separated strings (the SDK's
    StringArraySample layout — faceset name lists travel this way), and
    a wide string (POD 13, 32-bit code units)."""
    og = OgawaWriter()
    s_scalar = og.write_group([og.write_data(bytes(16) + b"hello\x00")])
    names = b"paint\x00glass\x00chrome\x00"
    s_array = og.write_group([og.write_data(bytes(16) + names), EMPTY_DATA])
    wide = "métal".encode("utf-32-le") + b"\x00\x00\x00\x00"
    s_wide = og.write_group([og.write_data(bytes(16) + wide)])

    headers = _prop_info(SCALAR, POD_STRING, 1, 1)
    headers += _name_meta_inline("note", "")
    headers += _prop_info(ARRAY, POD_STRING, 1, 1)
    headers += _name_meta_inline("matNames", "")
    headers += _prop_info(SCALAR, POD_WSTRING, 1, 1)
    headers += _name_meta_inline("wnote", "")
    props = og.write_group([s_scalar, s_array, s_wide, og.write_data(headers)])
    top = _object(og, props, [], b"")
    path = str(tmp_path / "strings.abc")
    og.save(path, _root(og, top))

    r = AbcReader(path)
    pr = r.top.properties()
    assert r.sample(pr["note"]) == "hello"
    assert r.sample(pr["matNames"]) == ["paint", "glass", "chrome"]
    assert r.sample(pr["wnote"]) == "métal"


def test_unknown_pod_fails_loudly(tmp_path):
    og = OgawaWriter()
    grp = og.write_group([og.write_data(bytes(16) + b"\x01\x02")])
    headers = _prop_info(SCALAR, 14, 1, 1)  # POD 14: not a real type
    headers += _name_meta_inline("mystery", "")
    props = og.write_group([grp, og.write_data(headers)])
    top = _object(og, props, [], b"")
    path = str(tmp_path / "unknownpod.abc")
    og.save(path, _root(og, top))

    r = AbcReader(path)
    pr = r.top.properties()
    with pytest.raises(ValueError, match="POD"):
        r.sample(pr["mystery"])


def test_animated_changing_topology_reads_sample0(tmp_path):
    """Animated P/faceCounts where the topology CHANGES between samples
    (different array sizes + per-sample dims words). The importer
    consumes sample 0 only (like the reference's default sample
    selectors, alembic.hpp:156-257); both samples must still decode
    exactly and sample 0 must be unpolluted by sample 1's layout."""
    og = OgawaWriter()
    p0 = np.arange(9, dtype=np.float32).reshape(3, 3)       # 3 verts
    p1 = np.arange(15, dtype=np.float32).reshape(5, 3) * 2  # 5 verts
    prop_group = og.write_group([
        og.write_data(_sample(p0)),
        og.write_data(np.array([3], np.uint64).tobytes()),
        og.write_data(_sample(p1)),
        og.write_data(np.array([5], np.uint64).tobytes()),
    ])
    headers = _prop_info(
        ARRAY, POD_FLOAT32, 3, 2, no_repeats=False,
        extra=struct.pack("<II", 1, 1),
    )
    headers += _name_meta_inline("P", "")
    c0 = np.array([3], np.int32)
    c1 = np.array([3, 3], np.int32)
    counts_group = og.write_group([
        og.write_data(_sample(c0)), EMPTY_DATA,
        og.write_data(_sample(c1)), EMPTY_DATA,
    ])
    headers += _prop_info(
        ARRAY, POD_INT32, 1, 2, no_repeats=False,
        extra=struct.pack("<II", 1, 1),
    )
    headers += _name_meta_inline(".faceCounts", "")
    props = og.write_group([prop_group, counts_group, og.write_data(headers)])
    top = _object(og, props, [], b"")
    path = str(tmp_path / "anim.abc")
    og.save(path, _root(og, top))

    r = AbcReader(path)
    pr = r.top.properties()
    np.testing.assert_array_equal(r.sample(pr["P"], 0), p0)
    np.testing.assert_array_equal(r.sample(pr["P"], 1), p1)
    np.testing.assert_array_equal(r.sample(pr[".faceCounts"], 0), c0)
    np.testing.assert_array_equal(r.sample(pr[".faceCounts"], 1), c1)


def test_acyclic_time_sampling_blob_tolerated(tmp_path):
    """Root child 4 carries a serialized ACYCLIC time sampling (max-
    samples word + per-sample float64 times, the AbcCoreOgawa wire
    form). The reader reads sample 0 by index and must not choke on the
    blob (it ignores time metadata by design — static import)."""
    og = OgawaWriter()
    arr = np.arange(6, dtype=np.float32)
    prop_group = og.write_group([og.write_data(_sample(arr)), EMPTY_DATA])
    headers = _prop_info(
        ARRAY, POD_FLOAT32, 1, 1, has_tsidx=True,
        extra=struct.pack("<I", 1),
    )
    headers += _name_meta_inline("P", "")
    props = og.write_group([prop_group, og.write_data(headers)])
    top = _object(og, props, [], b"")

    # root with a nonzero time-samplings blob in slot 4
    ts_blob = struct.pack("<I", 3) + np.array(
        [0.0, 0.04, 0.21], np.float64
    ).tobytes()
    idx_payload = b""
    root = og.write_group([
        og.write_data(struct.pack("<I", 0)),
        og.write_data(struct.pack("<I", 10709)),
        top,
        og.write_data(b"_ai_Application=acyclic"),
        og.write_data(ts_blob),
        og.write_data(idx_payload),
    ])
    path = str(tmp_path / "acyclic.abc")
    og.save(path, root)

    r = AbcReader(path)
    pr = r.top.properties()
    np.testing.assert_array_equal(r.sample(pr["P"]), arr)


def test_corrupted_archive_fuzz(tmp_path):
    """Random single-byte corruptions of a valid archive: every mutant
    must either parse (returning SOME data) or raise a loud Python
    exception — never hang, never crash the interpreter. Exercises the
    reader's bounds discipline on indices, counts and offsets."""
    og = OgawaWriter()
    arr = np.arange(24, dtype=np.float32).reshape(8, 3)
    prop_group = og.write_group([og.write_data(_sample(arr)), EMPTY_DATA])
    headers = _prop_info(ARRAY, POD_FLOAT32, 3, 1)
    headers += _name_meta_inline("P", "")
    props = og.write_group([prop_group, og.write_data(headers)])
    child = _object(og, props, [], b"")
    top = _object(og, 0, [child], _name_meta_inline("mesh", ""))
    path = str(tmp_path / "clean.abc")
    og.save(path, _root(og, top))
    clean = open(path, "rb").read()

    rng_ = np.random.default_rng(7)
    outcomes = {"ok": 0, "raised": 0}
    for trial in range(120):
        buf = bytearray(clean)
        off = int(rng_.integers(0, len(buf)))
        buf[off] ^= int(rng_.integers(1, 256))
        mp = str(tmp_path / "mut.abc")
        with open(mp, "wb") as f:
            f.write(bytes(buf))
        try:
            r = AbcReader(mp)
            for k in r.top.children():
                for name, prop in k.properties().items():
                    if prop[0].ptype != 0:
                        r.sample(prop)
            outcomes["ok"] += 1
        except Exception:  # noqa: BLE001 - loud failure is the contract
            outcomes["raised"] += 1
    # both outcomes must occur: corruption is detected loudly at least
    # sometimes, and benign flips (hash bytes etc.) still parse
    assert outcomes["ok"] > 0 and outcomes["raised"] > 0, outcomes
