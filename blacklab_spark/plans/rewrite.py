"""CQL AST rewrite rules — the planner-side optimizer pass.

A small fixpoint rule engine over the parsed BCQL tree, mirroring the
reference's rewrite catalog (/root/reference/doc/technical/query rewriting.md;
driver loop BLSpanQuery.optimize/rewrite, /root/reference/engine/src/main/
java/nl/inl/blacklab/search/lucene/BLSpanQuery.java:170-175; ClauseCombiner
priority loop /root/reference/engine/.../lucene/SpanQuerySequence.java:296-340):

  flatten          SEQ(A, SEQ(B, C)) → SEQ(A, B, C)        ("Flatten")
  unwrap_group     (A){m,n} → A{m,n} when the group is one unquantified,
                   unlabeled unit                          (repetition simpl.)
  combine_reps     A{a,b} A{c,d} → A{a+c, b+d} for adjacent identical,
                   unlabeled atoms                         ("CCRepetition")
  merge_gaps       []{a,b} []{c,d} → []{a+c, b+d}          (gap coalescing)
  drop_empty_gap   []{0,0} removed from sequences

Rules run to a fixpoint, exactly like the reference ("Rewrites iterate until
nothing changes", query rewriting.md:13). The compiler consumes the rewritten
tree; results are identical by construction — the rules only reshape the plan
(fewer joins: one repetition self-join instead of N-1 sequence joins, one gap
join instead of two).
"""

from __future__ import annotations

from blacklab_spark.plans.cql import (
    UNBOUNDED,
    AlignNode,
    AnyToken,
    ConstrainedNode,
    Lookahead,
    PosFilterNode,
    RelNode,
    RcaptureNode,
    RelFuncNode,
    WithSpansNode,
    RspanNode,
    SeqNode,
    Unit,
    XFuncNode,
)


def _rewrite_units(units: tuple) -> tuple | None:
    """One pass over a unit list; returns the new tuple or None if unchanged."""
    out = []
    changed = False
    for u in units:
        node = rewrite(u.node)
        if node is not u.node:
            u = Unit(node, u.m, u.n, u.label)
            changed = True
        # drop []{0,0}
        if isinstance(u.node, AnyToken) and u.label is None and (u.m, u.n) == (0, 0):
            changed = True
            continue
        # flatten: an unquantified, unlabeled SEQ unit splices its units in
        if isinstance(u.node, SeqNode) and (u.m, u.n) == (1, 1) and u.label is None:
            out.extend(u.node.units)
            changed = True
            continue
        # unwrap_group: (A){m,n} → A{m,n} when the group is one plain unit
        if (
            isinstance(u.node, SeqNode)
            and len(u.node.units) == 1
            and u.node.units[0].label is None
            and (u.node.units[0].m, u.node.units[0].n) == (1, 1)
        ):
            u = Unit(u.node.units[0].node, u.m, u.n, u.label)
            changed = True
        # combine_reps / merge_gaps: fold into the previous unit when the
        # atom is identical (and neither side is captured)
        if out:
            p = out[-1]
            same_atom = (
                p.label is None and u.label is None
                and not isinstance(p.node, Lookahead)
                and not isinstance(u.node, Lookahead)
                and (
                    (isinstance(p.node, AnyToken) and isinstance(u.node, AnyToken))
                    or p.node == u.node
                )
            )
            if same_atom:
                out[-1] = Unit(p.node, p.m + u.m, min(p.n + u.n, UNBOUNDED), None)
                changed = True
                continue
        out.append(u)
    return tuple(out) if changed else None


def rewrite(node):
    """Rewrite to fixpoint. Frozen dataclasses compare by value, so the
    fixpoint check is plain equality."""
    while True:
        if isinstance(node, SeqNode):
            nu = _rewrite_units(node.units)
            if nu is None:
                return node
            node = SeqNode(nu)
        elif isinstance(node, Lookahead):
            inner = rewrite(node.node)
            if inner is node.node:
                return node
            node = Lookahead(inner, node.negative)
        elif isinstance(node, PosFilterNode):
            p, f = rewrite(node.producer), rewrite(node.filt)
            if p is node.producer and f is node.filt:
                return node
            node = PosFilterNode(p, f, node.op, node.invert)
        elif isinstance(node, ConstrainedNode):
            q = rewrite(node.q)
            if q is node.q:
                return node
            node = ConstrainedNode(q, node.conditions)
        elif isinstance(node, RelNode):
            s = None if node.src is None else rewrite(node.src)
            t = None if node.tgt is None else rewrite(node.tgt)
            if s is node.src and t is node.tgt:
                return node
            node = RelNode(s, node.rel_type, t, node.root)
        elif isinstance(node, RspanNode):
            inner = rewrite(node.node)
            if inner is node.node:
                return node
            node = RspanNode(inner, node.mode)
        elif isinstance(node, XFuncNode):
            if node.node is None:
                return node
            inner = rewrite(node.node)
            if inner is node.node:
                return node
            node = XFuncNode(node.fname, inner, node.args)
        elif isinstance(node, RcaptureNode):
            inner = rewrite(node.node)
            if inner is node.node:
                return node
            node = RcaptureNode(inner, node.label, node.rel_type)
        elif isinstance(node, RelFuncNode):
            if node.tgt is None:
                return node
            t = rewrite(node.tgt)
            if t is node.tgt:
                return node
            node = RelFuncNode(node.rel_type, t, node.mode, node.direction)
        elif isinstance(node, WithSpansNode):
            a, b = rewrite(node.node), rewrite(node.spans)
            if a is node.node and b is node.spans:
                return node
            node = WithSpansNode(a, b, node.label)
        elif isinstance(node, AlignNode):
            s = rewrite(node.src)
            t = None if node.tgt is None else rewrite(node.tgt)
            if s is node.src and t is node.tgt:
                return node
            node = AlignNode(s, node.rel_type, node.version, t)
        elif isinstance(node, tuple) and node and node[0] in ("alt", "and"):
            alts = tuple(rewrite(a) for a in node[1])
            if all(a is b for a, b in zip(alts, node[1])):
                return node
            node = (node[0], alts)
        else:
            return node
