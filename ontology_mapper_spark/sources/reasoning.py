"""Bounded structural classification — the engine's counterpart of the
reference collector's optional HermiT run (``term_collector.py:20``
``use_reasoning=True`` -> ``_classify_ontology``, ``:352-363``).

SCOPE (honest statement): this is NOT a DL reasoner. It implements the
EL-horn subsumption rules that drive classification in EFO/MONDO-style
biomedical ontologies — the dominant effect of HermiT there is that
*defined* classes (``C EquivalentTo: D and (p some F)``) acquire inferred
subclasses: any X whose told/derived superclasses and existential
restrictions entail every conjunct of C's definition gets ``X SubClassOf
C``. Covered:

- conjunction (``owl:intersectionOf``) and existential restriction
  (``owl:someValuesFrom``) conjuncts
- named equivalences (``A EquivalentTo B`` classifies each under the other)
- filler subsumption (``p some LeftLung`` satisfies ``p some Lung`` when
  LeftLung ⊑* Lung) and property hierarchies (``q SubPropertyOf p``)
- inherited restrictions (X ⊑ Y and Y ⊑ ``p some F`` gives X the
  constraint) and fixpoint iteration (an inferred edge can enable more)

NOT covered (HermiT would be): disjointness/inconsistency detection,
complement/union/cardinality constructs, property chains, inverse
properties, nominals, and owlready2's ``infer_property_values``. Ontologies
relying on those get only the asserted + EL-derivable hierarchy.

Runs driver-side over the parsed term dicts (ontologies are dimension
data — the reference also reasons in-process). Candidate generation is
seeded from the rarest named conjunct's descendant set, so cost is
~O(iterations x definitions x matching-descendants), not classes^2.
"""

from __future__ import annotations


def _ancestors(parents: dict[str, set[str]]) -> dict[str, set[str]]:
    """Transitive ancestors per node, cycle-CORRECT: strongly connected
    components are condensed first (iterative Tarjan), then ancestor sets
    propagate over the acyclic condensation. Every member of a cycle gets
    the full set — including the cycle itself (A <-> B yields {A, B} for
    both; merged/malformed ontologies assert such loops). The r3 DFS+memo
    version cached PARTIAL sets for nodes finished while a cycle was still
    open on the stack, silently losing subsumptions (r3 ADVICE #2).
    Acyclic behavior is unchanged: a node's own IRI is not an ancestor
    unless it sits on a cycle (incl. a self-loop)."""
    nodes = set(parents)
    for ps in parents.values():
        nodes.update(ps)

    # Tarjan, iterative (ontology hierarchies overflow Python recursion)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    onstk: set[str] = set()
    stk: list[str] = []
    sccs: list[list[str]] = []
    comp_of: dict[str, int] = {}
    counter = 0
    for root in nodes:
        if root in index:
            continue
        index[root] = low[root] = counter
        counter += 1
        stk.append(root)
        onstk.add(root)
        work = [(root, iter(parents.get(root, ())))]
        while work:
            n, it = work[-1]
            advanced = False
            for p in it:
                if p not in index:
                    index[p] = low[p] = counter
                    counter += 1
                    stk.append(p)
                    onstk.add(p)
                    work.append((p, iter(parents.get(p, ()))))
                    advanced = True
                    break
                if p in onstk:
                    low[n] = min(low[n], index[p])
            if not advanced:
                work.pop()
                if work:
                    low[work[-1][0]] = min(low[work[-1][0]], low[n])
                if low[n] == index[n]:
                    comp = []
                    while True:
                        w = stk.pop()
                        onstk.discard(w)
                        comp.append(w)
                        comp_of[w] = len(sccs)
                        if w == n:
                            break
                    sccs.append(comp)

    # Tarjan emits each SCC after every SCC it can reach — propagate
    # ancestor sets in emission order over the condensation DAG
    comp_anc: list[set[str]] = []
    anc: dict[str, set[str]] = {}
    for ci, comp in enumerate(sccs):
        cyclic = len(comp) > 1 or any(n in parents.get(n, ()) for n in comp)
        out: set[str] = set(comp) if cyclic else set()
        for n in comp:
            for p in parents.get(n, ()):
                cj = comp_of[p]
                if cj != ci:
                    out.add(p)
                    out |= comp_anc[cj]
        comp_anc.append(out)
        for n in comp:
            anc[n] = out
    return anc


def classify_terms(terms: dict[str, dict]) -> int:
    """Mutate ``terms`` (iri -> parse_owl-internal term dict): add inferred
    ``parents`` entries per the module-docstring rules. Returns the number
    of inferred subsumptions added."""
    class_iris = [i for i, t in terms.items() if t["term_type"] == "class"]
    parents: dict[str, set[str]] = {
        i: set(terms[i]["parents"]) for i in class_iris
    }
    prop_parents: dict[str, set[str]] = {
        i: set(t["parents"])
        for i, t in terms.items()
        if t["term_type"] == "property"
    }
    restrictions: dict[str, dict[str, set[str]]] = {}
    for i in class_iris:
        for p, f in terms[i].get("restrictions", {}).items():
            restrictions.setdefault(i, {}).setdefault(p, set()).add(f)

    definitions = [
        (i, d)
        for i in class_iris
        for d in terms[i].get("equiv", [])
        if d["named"] or d["restrictions"]
    ]
    if not definitions:
        return 0

    prop_anc = _ancestors(prop_parents)
    added = 0
    changed = True
    while changed:
        changed = False
        anc = _ancestors(parents)
        descendants: dict[str, set[str]] = {}
        for x in class_iris:
            for a in anc[x]:
                descendants.setdefault(a, set()).add(x)

        def restr_star(x: str) -> dict[str, set[str]]:
            """x's existential constraints incl. those inherited from
            ancestors: {property: {fillers}}."""
            out: dict[str, set[str]] = {}
            for z in (x, *anc[x]):
                for p, fs in restrictions.get(z, {}).items():
                    out.setdefault(p, set()).update(fs)
            return out

        def satisfies_restr(x: str, p: str, f: str) -> bool:
            rs = restr_star(x)
            for q, fillers in rs.items():
                if q == p or p in prop_anc.get(q, set()):
                    for g in fillers:
                        if g == f or f in anc.get(g, set()):
                            return True
            return False

        for c, d in definitions:
            named = [n for n in d["named"] if n != c]
            # C itself entails every conjunct of its own definition, so the
            # named conjuncts are superclasses of C (told at parse time for
            # intersection conjuncts; this adds the named-equivalence case,
            # A EquivalentTo B => A ⊑ B)
            for n in named:
                if n in parents.get(c, set()):
                    continue
                if c in parents:
                    parents[c].add(n)
                    added += 1
                    changed = True
            # candidates: intersection of each named conjunct's descendant
            # pool (every X ⊑ C must be at-or-below ALL named conjuncts —
            # the conjunct itself qualifies: X == N satisfies X ⊑ N for
            # classification, which is what makes B land under A for
            # A EquivalentTo B); definitions with no named conjunct fall
            # back to classes carrying restrictions
            if named:
                pools = [
                    descendants.get(n, set()) | ({n} if n in parents else set())
                    for n in named
                ]
                cand = set.intersection(*pools) if all(pools) else set()
            else:
                cand = {x for x in class_iris if restr_star(x)}
            for x in cand:
                if x == c or c in anc[x] or c in parents[x]:
                    continue
                if all(
                    satisfies_restr(x, p, f)
                    for p, f in d["restrictions"].items()
                ):
                    parents[x].add(c)
                    added += 1
                    changed = True

    for i in class_iris:
        for p in parents[i]:
            if p not in terms[i]["parents"]:
                terms[i]["parents"][p] = ""  # label resolved by parse_owl
    return added
