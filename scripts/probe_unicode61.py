#!/usr/bin/env python3
"""Probe SQLite FTS5's default `unicode61` tokenizer (remove_diacritics=1)
per codepoint, and emit compact tables consumed by
src/main/scala/graft/functions/Unicode61Data.scala (generated).

Methodology (probe-first, same as the FTS5 grammar work): for every
codepoint we ask the REAL tokenizer, via an fts5vocab shadow table, how it
classifies the char:

  - SEPARATOR : tokenizing "a<c>b" yields tokens {a, b}
  - REMOVED   : tokenizing "a<c>b" yields token {ab}  (diacritics — the
                char is elided but does NOT break the token)
  - TOKEN     : tokenizing "<c>" alone yields one term == fold(<c>)

The tokenizer is strictly per-codepoint (SQLite fts5_unicode2.c is a
codepoint-driven state machine), so per-char probes fully determine its
behavior; Unicode61Spec re-verifies on multi-script strings against the
sqlite3 *binary* as a second, independent implementation.

Output (stdout): four sections, one line each, space-separated ints:
  ALNUM  r0start r0end r1start r1end ...   (inclusive ranges of TOKEN chars
                                            whose fold == themselves)
  FOLD   cp folded cp folded ...           (TOKEN chars with fold != self)
  JOIN   r0start r0end ...                 (inclusive ranges of REMOVED chars)
  KEEP   r0start r0end ...                 (inclusive ranges of chars kept
                                            verbatim inside a token, skipped
                                            outside one — rd=0's combining
                                            marks; empty for rd=1/2)
"""
import sqlite3, sys

BATCH = 40000
# Tokenizer spec as argv[1] (default: the unicode61 rd=1 this script was
# born probing). Same methodology for every FTS5 tokenizer option set:
#   python3 scripts/probe_unicode61.py "unicode61 remove_diacritics 2"
#   python3 scripts/probe_unicode61.py "ascii"
TOKENIZER = sys.argv[1] if len(sys.argv) > 1 else "unicode61"
# the spec is spliced into CREATE VIRTUAL TABLE inside single quotes —
# escape any embedded quote so a spec like "unicode61 tokenchars '-'"
# cannot break the statement
TOKENIZER = TOKENIZER.replace("'", "''")

def probe(lo, hi):
    """Return dict cp -> ('sep'|'join'|'keep'|token_string) for cp in [lo,hi)."""
    out = {}
    db = sqlite3.connect(":memory:")
    db.execute("CREATE VIRTUAL TABLE t USING fts5(x, tokenize='%s')" % TOKENIZER)
    db.execute("CREATE VIRTUAL TABLE v USING fts5vocab(t,'instance')")
    cps = [cp for cp in range(lo, hi) if not (0xD800 <= cp <= 0xDFFF)]
    with db:
        db.executemany("INSERT INTO t(rowid,x) VALUES (?,?)",
                       [(cp, chr(cp)) for cp in cps])
    folded = {}
    for term, doc in db.execute("SELECT term, doc FROM v"):
        folded[doc] = term
    # chars with no solo term are either separators or removed joiners:
    # disambiguate with the a<c>b probe.
    rest = [cp for cp in cps if cp not in folded]
    db.execute("DELETE FROM t")
    with db:
        db.executemany("INSERT INTO t(rowid,x) VALUES (?,?)",
                       [(cp, "a" + chr(cp) + "b") for cp in rest])
    kinds = {}
    for term, doc in db.execute("SELECT term, doc FROM v"):
        kinds.setdefault(doc, []).append(term)
    for cp in rest:
        ts = sorted(kinds.get(cp, []))
        if ts == ["ab"]:
            out[cp] = "join"
        elif ts == ["a", "b"]:
            out[cp] = "sep"
        elif ts == ["a" + chr(cp) + "b"]:
            # kept verbatim inside a token (rd=0's combining-mark class)
            out[cp] = "keep"
        else:
            # e.g. a char that folds to a letter was already caught above;
            # anything else is unexpected — fail loudly.
            raise AssertionError(f"U+{cp:04X}: unexpected probe result {ts}")
    for cp, term in folded.items():
        out[cp] = term
    db.close()
    return out

def main():
    alnum_self, fold, join, keep = [], [], [], []
    for lo in range(0x20, 0x110000, BATCH):
        hi = min(lo + BATCH, 0x110000)
        res = probe(lo, hi)
        for cp in sorted(res):
            k = res[cp]
            if k == "sep":
                continue
            elif k == "join":
                join.append(cp)
            elif k == "keep":
                keep.append(cp)
            else:
                f = [ord(c) for c in k]
                assert len(f) == 1, f"U+{cp:04X} folds to {len(f)} cps"
                if f[0] == cp:
                    alnum_self.append(cp)
                else:
                    fold.append((cp, f[0]))
        sys.stderr.write(f"probed through U+{hi-1:05X}\n")

    def ranges(cps):
        out = []
        for cp in cps:
            if out and cp == out[-1][1] + 1:
                out[-1][1] = cp
            else:
                out.append([cp, cp])
        return out

    print("ALNUM", " ".join(f"{a} {b}" for a, b in ranges(alnum_self)))
    print("FOLD", " ".join(f"{a} {b}" for a, b in fold))
    print("JOIN", " ".join(f"{a} {b}" for a, b in ranges(join)))
    print("KEEP", " ".join(f"{a} {b}" for a, b in ranges(keep)))

if __name__ == "__main__":
    main()
