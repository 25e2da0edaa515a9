#!/usr/bin/env python3
"""Probe the sqlite3 binary's FTS5 `trigram` tokenizer fold, per codepoint.

Method: for every codepoint C (1..0x10FFFF minus surrogates), insert the
3-char row 'a' || char(C) || 'b' with rowid=C into an fts5 table declared
`tokenize='trigram'` (default options: case_sensitive 0,
remove_diacritics 0), then read the emitted tokens back through
fts5vocab(t, 'instance'). A row whose token is 'a' + F + 'b' reveals
fold(C) = F; a row that emits NO token means C vanished from the stream
(none observed on 3.51.2); a token of length != 3 would reveal a
multi-char fold (none observed — FTS5 uses simple case folding).

Output (stdout): two sections consumed by TrigramFoldData.scala:
  FOLD  comma-separated cp,foldedCp pairs where fold(cp) != cp
  SKIP  comma-separated cps that emitted no token

Run against the SAME binary SqliteCli discovers (the FTS parity target).

Tokenizer spec as argv[2] (default 'trigram'); same methodology per
option set: `probe_trigram.py sqlite3 "trigram remove_diacritics 1"`.
"""
import subprocess, sys, tempfile, os

SQLITE = sys.argv[1] if len(sys.argv) > 1 else "sqlite3"
SPEC = (sys.argv[2] if len(sys.argv) > 2 else "trigram").replace("'", "''")

def probe(lo, hi):
    """Return {cp: (folded_cp_or_None, token_len)} for cps in [lo, hi)."""
    sql = [f"CREATE VIRTUAL TABLE t USING fts5(x, tokenize='{SPEC}');",
           "CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance');",
           "BEGIN;"]
    cps = [c for c in range(lo, hi) if not (0xD800 <= c <= 0xDFFF)]
    for c in cps:
        sql.append(f"INSERT INTO t(rowid,x) VALUES({c},'a'||char({c})||'b');")
    sql.append("COMMIT;")
    sql.append("SELECT doc, length(term), "
               "unicode(substr(term,2,length(term)-2)) FROM v;")
    with tempfile.NamedTemporaryFile("w", suffix=".sql", delete=False) as f:
        f.write("\n".join(sql))
        path = f.name
    try:
        out = subprocess.run([SQLITE, ":memory:"], stdin=open(path),
                             capture_output=True, text=True, timeout=600)
    finally:
        os.unlink(path)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[:500])
    got = {}
    for line in out.stdout.splitlines():
        doc, tlen, mid = line.split("|")
        got[int(doc)] = (int(mid) if mid else None, int(tlen))
    return {c: got.get(c, (None, 0)) for c in cps}

def main():
    folds, skips, weird = [], [], []
    step = 0x8000
    for lo in range(1, 0x110000, step):
        for c, (f, tlen) in probe(lo, min(lo + step, 0x110000)).items():
            if tlen == 0:
                skips.append(c)
            elif tlen != 3:
                weird.append((c, f, tlen))
            elif f != c:
                folds.append((c, f))
        print(f"probed ..{min(lo+step, 0x110000):#x}: "
              f"{len(folds)} folds, {len(skips)} skips", file=sys.stderr)
    if weird:
        print(f"MULTI-CHAR FOLDS (handle!): {weird[:20]}", file=sys.stderr)
        sys.exit(1)
    print("FOLD " + ",".join(f"{c},{f}" for c, f in sorted(folds)))
    print("SKIP " + ",".join(str(c) for c in sorted(skips)))

if __name__ == "__main__":
    main()
