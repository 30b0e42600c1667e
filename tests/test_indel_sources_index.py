"""EventsIndelSources lazy vectorized index == the straightforward dict
semantics (the pre-optimization implementation), including vote tie-break
order, on randomized event arrays.

The production index answers per-position queries from a position-sorted
view plus one code->base byte blob; this oracle rebuilds the literal
"walk every op, str-join its bases, dict-of-lists by position" form that
used to live in call_bam.py and checks every queried answer matches.
"""

import numpy as np

from clair_tpu.data.pileup import ReadEvents
from clair_tpu.pipeline.call_bam import EventsIndelSources, _QCOL_TO_BASE


class _FakeFasta:
    def __init__(self, seq, offset=0):
        self.seq = seq
        self.offset = offset

    def fetch(self, contig, start, end):
        return self.seq[start - self.offset:end - self.offset]


def _make_events(rs, n_ins_ops, n_del_ops, pos_range):
    ins_op_len = rs.randint(1, 9, n_ins_ops)
    total = int(ins_op_len.sum())
    empty = np.zeros(0, np.int64)
    return ReadEvents(
        match_pos=empty, match_qcol=empty, match_strand=empty,
        ins_pos=empty, ins_adv=empty,
        ins_qcol=rs.randint(-2, 9, total).astype(np.int8),
        ins_strand=empty,
        del_pos=empty, del_strand=empty,
        ins_op_pos=rs.randint(0, pos_range, n_ins_ops).astype(np.int64),
        del_op_pos=rs.randint(0, pos_range, n_del_ops).astype(np.int64),
        ins_op_len=ins_op_len.astype(np.int64),
        del_op_len=rs.randint(1, 30, n_del_ops).astype(np.int64),
    )


def _oracle_indexes(events):
    ins_index, del_index = {}, {}
    offsets = np.concatenate([[0], np.cumsum(events.ins_op_len)]).astype(np.int64)
    for i in range(len(events.ins_op_pos)):
        lo, hi = offsets[i], offsets[i + 1]
        bases = "".join(
            _QCOL_TO_BASE[min(int(c), 6)] if c >= 0 else "N"
            for c in events.ins_qcol[lo:hi]
        )
        ins_index.setdefault(int(events.ins_op_pos[i]), []).append(bases)
    for position, length in zip(events.del_op_pos, events.del_op_len):
        del_index.setdefault(int(position), []).append(int(length))
    return ins_index, del_index


def _oracle_insertion(ins_index, position, lo, hi, ignore=""):
    votes = {}
    for bases in ins_index.get(int(position), []):
        if lo <= len(bases) <= hi and bases != ignore:
            votes[bases] = votes.get(bases, 0) + 1
    return max(votes, key=votes.get) if votes else ""


def _oracle_deletion(del_index, fasta, contig, position, lo, hi):
    votes = {}
    for length in del_index.get(int(position), []):
        if lo <= length <= hi:
            bases = fasta.fetch(contig, position, position + length)
            votes[bases] = votes.get(bases, 0) + 1
    return max(votes, key=votes.get) if votes else ""


def test_lazy_index_matches_dict_oracle():
    rs = np.random.RandomState(7)
    fasta = _FakeFasta("".join(rs.choice(list("ACGT"), 300)))
    # pos_range 40 over 500 ops forces many multi-op positions (vote ties)
    events = _make_events(rs, n_ins_ops=500, n_del_ops=400, pos_range=40)
    src = EventsIndelSources(events, fasta, "chr1")
    ins_index, del_index = _oracle_indexes(events)

    for position in range(-2, 45):
        for lo, hi in ((1, 60), (2, 5), (8, 8), (10, 4)):
            got = src.insertion_bases("chr1", position, lo, hi)
            want = _oracle_insertion(ins_index, position, lo, hi)
            assert got == want, (position, lo, hi, got, want)
            got = src.deletion_bases("chr1", position, lo, hi)
            want = _oracle_deletion(del_index, fasta, "chr1", position, lo, hi)
            assert got == want, (position, lo, hi, got, want)

    # bases_to_ignore path: the runner-up must win
    for position in range(40):
        best = _oracle_insertion(ins_index, position, 1, 60)
        if not best:
            continue
        got = src.insertion_bases("chr1", position, 1, 60, bases_to_ignore=best)
        want = _oracle_insertion(ins_index, position, 1, 60, ignore=best)
        assert got == want


def test_lazy_index_empty_events():
    rs = np.random.RandomState(1)
    events = _make_events(rs, n_ins_ops=0, n_del_ops=0, pos_range=10)
    src = EventsIndelSources(events, _FakeFasta("ACGT" * 10), "chr1")
    assert src.insertion_bases("chr1", 3, 1, 50) == ""
    assert src.deletion_bases("chr1", 3, 1, 50) == ""
