#!/usr/bin/env python3
"""Natural-text fixture corpus (r12 verdict #4): every text/BPE/LM
number so far was measured on the synthetic Zipf corpus, whose
50k-word dict a 32k-merge BPE nearly covers (fertility 1.023) — a
natural-language corpus guards the text family against synthetic-data
overfitting. Zero-egress container, so the corpus is harvested from
PUBLIC ENGLISH PROSE ALREADY ON DISK, deterministically:

  - /usr/share/common-licenses/*          (FSF/Apache/MPL license text)
  - /usr/share/doc/*/copyright            (Debian copyright prose —
                                           heavily duplicated across
                                           packages: natural near-dup
                                           structure, not injected)
  - /opt/spark/{README.md,LICENSE,NOTICE}

Paragraphs are packed into ~1-3 kchar documents with the same schema
as gen_sf.py's documents table (doc_id, text, lang, source, n_chars);
text is whitespace-normalized exactly like the engine's tokenizer
expects (single spaces, printable ASCII kept, the rest dropped) so
DuckDB string functions and UTF8String byte walks agree trivially.

Usage: python3 tools/gen_natural.py testdata/natural [--siblings <sfdir>]
                                                     [--emb-bow]
(--siblings copies the non-documents tables from an existing sf corpus
so the oracle checker's 10 table views all resolve; the text-family
queries never read them.)

--emb-bow (r13 verdict #6): instead of copying the sibling's SYNTHETIC
embeddings, derive a deterministic hashed bag-of-words projection of
the natural documents themselves — 64-dim SimHash-style random
projection (per-token weight vectors from md5, averaged over the doc's
tokens). Zero egress, fully deterministic, and the vectors inherit the
corpus's REAL cluster structure: exact-dup license texts map to
identical vectors, boilerplate near-dups to near-identical ones — the
geometry the ANN/dd07/dd10 family had only ever been audited on
synthetically. Both engines read the same parquet floats, so every ss
oracle runs unchanged.
Builder-side dev tool (driver python env), not part of the library.
"""
import glob
import os
import re
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1]
os.makedirs(out, exist_ok=True)
if "--siblings" in sys.argv:
    sib = sys.argv[sys.argv.index("--siblings") + 1]
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        src = f"{sib}/{t}.parquet"
        if os.path.exists(src):
            shutil.copyfile(src, f"{out}/{t}.parquet")

files = sorted(glob.glob("/usr/share/common-licenses/*"))
files += sorted(glob.glob("/usr/share/doc/*/copyright"))
files += [p for p in ("/opt/spark/README.md", "/opt/spark/LICENSE",
                      "/opt/spark/NOTICE") if os.path.exists(p)]
files = [f for f in files if os.path.isfile(f)]

# normalize: keep printable ASCII + newline (license text is ASCII
# English; the odd UTF-8 name char is dropped, not mangled)
keep = re.compile(r"[^\n\x20-\x7e]")
ws = re.compile(r"\s+")

docs = []           # (text, source)
TARGET = 2500       # chars per packed document
for f in files:
    try:
        raw = open(f, "rb").read().decode("utf-8", errors="ignore")
    except OSError:
        continue
    raw = keep.sub(" ", raw)
    src = os.path.basename(os.path.dirname(f)) if f.endswith("copyright") \
        else os.path.basename(f)
    buf = []
    n = 0
    for para in raw.split("\n\n"):
        p = ws.sub(" ", para).strip()
        if len(p) < 40:        # skip headers/separator junk
            continue
        buf.append(p)
        n += len(p) + 1
        if n >= TARGET:
            docs.append((" ".join(buf), src))
            buf, n = [], 0
    if buf:
        docs.append((" ".join(buf), src))

texts = [t for t, _ in docs]
# source: stable 20-bucket hash of the originating package/file, the
# sf corpora's src0..src19 shape (sp07's mixture keys on it)
srcs = [f"src{sum(s.encode()) % 20}" for _, s in docs]
pq.write_table(pa.table({
    "doc_id": pa.array(range(len(docs)), pa.int64()),
    "text": texts,
    "lang": pa.array(["en"] * len(docs)),
    "source": pa.array(srcs),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), f"{out}/documents.parquet")
total = sum(len(t) for t in texts)
words = sum(len(t.split()) for t in texts)
print(f"{len(docs)} docs, {total/1e6:.1f} Mchars, {words/1e3:.0f} kwords, "
      f"{len(set(texts))} distinct texts -> {out}/documents.parquet")

if "--emb-bow" in sys.argv:
    import hashlib
    import struct
    DIM = 64
    wcache = {}

    def tokw(tok):
        # 64 per-token weights in [-1, 1] from 8 md5 digests (8 dims per
        # 16-byte digest via int16 pairs) — one cache entry per distinct
        # token, deterministic across runs/engines
        w = wcache.get(tok)
        if w is None:
            buf = b"".join(hashlib.md5(f"{tok}:{b}".encode()).digest()
                           for b in range(DIM // 8))
            ints = struct.unpack(f"<{DIM}h", buf[:DIM * 2])
            w = [v / 32768.0 for v in ints]
            wcache[tok] = w
        return w

    vecs = []
    for t in texts:
        toks = t.lower().split()
        acc = [0.0] * DIM
        for tok in toks:
            w = tokw(tok)
            for j in range(DIM):
                acc[j] += w[j]
        # float32 round-trip so the parquet floats are the ground truth
        # guard: a doc with zero whitespace tokens must yield a zero vector,
        # not a ZeroDivisionError abort (r14 ADVICE)
        d = max(len(toks), 1)
        vecs.append([struct.unpack("<f", struct.pack("<f", a / d))[0]
                     for a in acc])
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([sum(s.encode()) % 20 for _, s in docs], pa.int32()),
    }), f"{out}/embeddings.parquet")
    import collections
    dup = collections.Counter(tuple(v) for v in vecs)
    print(f"bow embeddings: {len(vecs)} x {DIM}, "
          f"{sum(c for c in dup.values() if c > 1)} vectors in exact-dup "
          f"groups -> {out}/embeddings.parquet")
