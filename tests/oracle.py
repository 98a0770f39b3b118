"""Single-threaded Python oracle replay for final-state comparison.

Applies collected change events in total order (commit_seq, event_seq,
event_id) with latest-wins + delete semantics. The engine's distributed
replay must match this byte-for-byte, including sha256(content)
(BASELINE.json per-row invariant).
"""

import hashlib


def oracle_final_state(rows):
    """rows: collected Rows with repo/path/op/commit_seq/event_seq/event_id/content."""
    best = {}
    for r in rows:
        k = (r.repo, r.path)
        o = (r.commit_seq, r.event_seq, r.event_id)
        cur = best.get(k)
        if cur is None or o >= cur[0]:
            best[k] = (o, r)
    out = {}
    for k, (_, r) in best.items():
        if r.op != "D":
            out[k] = {
                "commit": r.commit,
                "commit_seq": r.commit_seq,
                "event_seq": r.event_seq,
                "event_id": r.event_id,
                "content_sha": hashlib.sha256(r.content.encode()).hexdigest(),
            }
    return out


def engine_final_state(df):
    return {
        (r.repo, r.path): {
            "commit": r.commit,
            "commit_seq": r.commit_seq,
            "event_seq": r.event_seq,
            "event_id": r.event_id,
            "content_sha": r.content_sha,
        }
        for r in df.select(
            "repo", "path", "commit", "commit_seq", "event_seq", "event_id", "content_sha"
        ).collect()
    }
