#!/usr/bin/env python3
"""Content stamp for the per-round leak/copy scans (ADVICE round 9).

The driver's LEAKCHECK/COPYCHECK artifacts carry no fingerprint of the
scanned set, so a clean rerun is indistinguishable from a label bump.
This script makes the round's scan auditable: it enumerates the exact
source surface (src/**/*.scala + build.sbt), computes a deterministic
sha256 over sorted (path, content) pairs, re-runs the leak grep
builder-side over the same set, and writes SCANSTAMP.json with
{files_scanned, bytes_scanned, content_sha256, n_hits, hits}.

A relabel without a rescan is now visible: the stamp's content_sha256
would not match the committed tree. Run per round, commit the output.
"""
import hashlib, json, os, re, subprocess, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Same vocabulary of leak families the driver's LEAKCHECK uses: internal
# package imports, internal URLs/buckets, slack links, api keys, odd env
# vars. Patterns are generic (no proprietary names embedded here).
PATTERNS = {
    "internal-import": r"import\s+(?:com\.anthropic|ant\.|anthropic\.)",
    "internal-url": r"https?://[a-z0-9.-]*\b(?:anthropic|ant-internal|corp)\b",
    "slack-link": r"(?:slack\.com/archives|#[a-z0-9-]*claude[a-z0-9-]*)",
    "api-key": r"(?:sk-ant-|AKIA[0-9A-Z]{16})",
    "internal-bucket": r"s3://[a-z0-9.-]*\b(?:anthropic|internal)\b",
}

# Full-text (multi-line) families: a PEM header alone is a legitimate
# test-fixture placeholder; only a header followed by real base64 key
# material is a leak.
FULLTEXT_PATTERNS = {
    "private-key": r"-----BEGIN (?:RSA )?PRIVATE KEY-----\s*\n(?:[A-Za-z0-9+/=]{40,}\n){2,}",
}


def scan_files():
    out = []
    for base in ("src", "build.sbt"):
        p = os.path.join(ROOT, base)
        if os.path.isfile(p):
            out.append(p)
        else:
            for dirpath, _, names in os.walk(p):
                for n in names:
                    if n.endswith(".scala") or n.endswith(".sbt"):
                        out.append(os.path.join(dirpath, n))
    return sorted(out)


def main():
    files = scan_files()
    h = hashlib.sha256()
    total = 0
    hits = {k: [] for k in list(PATTERNS) + list(FULLTEXT_PATTERNS)}
    for f in files:
        data = open(f, "rb").read()
        rel = os.path.relpath(f, ROOT)
        h.update(rel.encode())
        h.update(b"\0")
        h.update(data)
        total += len(data)
        text = data.decode("utf-8", "replace")
        lines = text.splitlines()
        for fam, pat in PATTERNS.items():
            for i, line in enumerate(lines, 1):
                if re.search(pat, line, re.IGNORECASE):
                    hits[fam].append(f"{rel}:{i}")
        for fam, pat in FULLTEXT_PATTERNS.items():
            if re.search(pat, text):
                hits[fam].append(rel)
    n_hits = sum(len(v) for v in hits.values())
    git_head = subprocess.run(
        ["git", "-C", ROOT, "rev-parse", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    # The stamp scans the WORKING TREE; attributing working-tree content
    # to HEAD on a dirty tree would weaken the relabel-vs-rescan audit,
    # so record dirtiness of the scanned surface alongside the commit.
    git_dirty = bool(subprocess.run(
        ["git", "-C", ROOT, "status", "--porcelain", "--", "src", "build.sbt"],
        capture_output=True, text=True).stdout.strip())
    stamp = {
        "round": int(sys.argv[1]) if len(sys.argv) > 1 else None,
        "git_head": git_head,
        "git_dirty": git_dirty,
        "files_scanned": len(files),
        "bytes_scanned": total,
        "content_sha256": h.hexdigest(),
        "n_hits": n_hits,
        "hits": hits,
    }
    out = os.path.join(ROOT, "SCANSTAMP.json")
    with open(out, "w") as fh:
        json.dump(stamp, fh, indent=2)
        fh.write("\n")
    print(json.dumps({k: stamp[k] for k in
                      ("round", "files_scanned", "bytes_scanned",
                       "content_sha256", "n_hits")}))
    return 1 if n_hits else 0


if __name__ == "__main__":
    sys.exit(main())
