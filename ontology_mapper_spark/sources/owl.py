"""OWL ontology scan (RDF/XML + Turtle/NTriples) — SURVEY.md §2 S3/S4/J5,
without owlready2.

The reference parses OWL through owlready2's sqlite quadstore
(``term_collector.py:335-363``, accepting RDF/XML, OWL/XML and NTriples)
and extracts per-term fields (``term_collector.py:23-333``). This engine
keeps the parse driver-side (ontologies are dimension data) but uses
dependency-free parsers — an RDF/XML subset DOM walk, an OWL/XML
(functional-style XML) walk, and a Turtle/NTriples reader
(``sources/turtle.py``) — format-sniffed per file so a mixed-serialization
imports closure works, covering what the reference actually reads:

- ``owl:Class`` / property declarations (Object/Datatype/Annotation
  property -> term_type 'property'; reference ``term_collector.py:392-406``)
- labels: ``rdfs:label`` ∪ ``skos:prefLabel``; fallback IRI fragment
  (``term_collector.py:160-177``)
- synonyms: ``oboInOwl:hasExactSynonym`` ∪ NCIT ``P90`` ∪ EFO
  ``alternative_term`` (``term_collector.py:179-200``)
- definitions: ``skos:definition`` ∪ ``IAO_0000115``
  (``term_collector.py:305-333``)
- parents: named ``rdfs:subClassOf``/``rdfs:subPropertyOf`` resources,
  conjuncts of ``owl:intersectionOf`` lists, excluding ``owl:Thing``
  (``term_collector.py:93-119``)
- restrictions: ``owl:Restriction`` (onProperty -> filler)
  (``term_collector.py:121-132``)
- instances: ``owl:NamedIndividual``/typed individuals
  (``term_collector.py:147-158``)
- ``owl:deprecated`` true (``term_collector.py:76``)

Children maps are derived as the inverse of parents (J5), and parent/child
label values resolve through the parsed term set with IRI-fragment fallback
— matching the reference's label-resolution semantics.

``write_owl`` serializes the same subset (round-trip pinned by tests).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from ontology_mapper_spark.config import OntologyTermType

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
OBOINOWL = "http://www.geneontology.org/formats/oboInOwl#"
NCIT = "http://ncicb.nci.nih.gov/xml/owl/EVS/Thesaurus.owl#"
EFO_NS = "http://www.ebi.ac.uk/efo/"
IAO_DEF = "http://purl.obolibrary.org/obo/IAO_0000115"
OWL_THING = OWL + "Thing"

# single source of truth for the annotation predicates all three parsers
# (RDF/XML, OWL/XML, Turtle) read — add a predicate HERE and every
# serialization picks it up, keeping the identical-rows-per-format
# invariant the round-trip tests pin
LABEL_IRIS = {RDFS + "label", SKOS + "prefLabel"}
SYNONYM_IRIS = {
    OBOINOWL + "hasExactSynonym",
    NCIT + "P90",
    EFO_NS + "alternative_term",
}
DEFINITION_IRIS = {SKOS + "definition", IAO_DEF}


def _clark(iri: str) -> str:
    """Full IRI -> ElementTree '{ns}local' form (split at '#' or last '/')."""
    cut = iri.rfind("#") + 1 or iri.rfind("/") + 1
    return "{" + iri[:cut] + "}" + iri[cut:]


_LABEL_PROPS = {_clark(i) for i in LABEL_IRIS}
_SYNONYM_PROPS = {_clark(i) for i in SYNONYM_IRIS}
_DEFINITION_PROPS = {_clark(i) for i in DEFINITION_IRIS}
_PROPERTY_TAGS = {
    f"{{{OWL}}}ObjectProperty",
    f"{{{OWL}}}DatatypeProperty",
    f"{{{OWL}}}AnnotationProperty",
}


def _frag(iri: str) -> str:
    if "#" in iri:
        return iri.split("#")[1]
    return iri.rsplit("/", 1)[-1]


def _resolve_import(iri: str, base_dir: str) -> str | None:
    """Resolve an ``owl:imports`` target to a local file, offline-only:
    file:// URIs, paths relative to the importing file, or a same-directory
    basename match for http(s) IRIs (the standard local-catalog convention).
    Returns None when unresolvable (no network in this engine — the
    reference downloads imports through owlready2, ``term_collector.py:
    343-346``)."""
    import os

    if iri.startswith("file://"):
        p = iri[len("file://"):]
        return p if os.path.exists(p) else None
    if not iri.startswith(("http://", "https://")):
        p = iri if os.path.isabs(iri) else os.path.join(base_dir, iri)
        return p if os.path.exists(p) else None
    candidate = os.path.join(base_dir, iri.rstrip("/").rsplit("/", 1)[-1])
    return candidate if os.path.exists(candidate) else None


def parse_owl(
    path: str, follow_imports: bool = True, use_reasoning: bool = False
) -> list[dict]:
    """Parse an RDF/XML OWL file into onto_terms-shaped rows (see
    ``ontology.ONTO_TERMS_SCHEMA``).

    ``follow_imports``: walk the ``owl:imports`` closure (cycle-safe) the
    way the reference's signature enumeration includes imported ontologies'
    classes and properties (``term_collector.py:53-60``); imports that
    cannot be resolved to a local file are skipped (offline engine).
    Label fallback and parent/child resolution run once over the merged
    term set, so cross-file subclass edges resolve labels correctly.

    ``use_reasoning``: run the bounded structural classifier
    (``sources/reasoning.py``) before relation resolution — the engine's
    equivalent of the reference collector's ``use_reasoning=True`` HermiT
    classification (``term_collector.py:20,352-363``), covering the EL-ish
    definitional-axiom subset; see that module's docstring for the honest
    scope statement."""
    import os

    about_attr = f"{{{RDF}}}about"
    resource_attr = f"{{{RDF}}}resource"

    terms: dict[str, dict] = {}
    instances_of: dict[str, list[str]] = {}  # class_iri -> [instance iris]
    instance_labels: dict[str, str] = {}

    def get_term(iri: str, term_type: str) -> dict:
        t = terms.get(iri)
        if t is None:
            t = {
                "iri": iri,
                "labels": [],
                "synonyms": [],
                "definitions": [],
                "parents": {},
                "children": {},
                "instances": {},
                "restrictions": {},
                "deprecated": False,
                "term_type": term_type,
                # equivalence definitions, kept separately for the optional
                # structural classifier (sources/reasoning.py); stripped
                # before onto_terms_from_rows
                "equiv": [],
            }
            terms[iri] = t
        return t

    def _restriction_of(restriction: ET.Element) -> tuple[str, str] | None:
        on_prop = restriction.find(f"{{{OWL}}}onProperty")
        filler = restriction.find(f"{{{OWL}}}someValuesFrom")
        if on_prop is not None and filler is not None:
            p = on_prop.get(resource_attr)
            f = filler.get(resource_attr)
            if p and f:
                return (p, f)
        return None

    def add_restriction(restriction: ET.Element, term: dict,
                        defn: dict | None = None) -> None:
        r = _restriction_of(restriction)
        if r is not None:
            term["restrictions"][r[0]] = r[1]
            if defn is not None:
                defn["restrictions"][r[0]] = r[1]

    def parse_intersection(cls: ET.Element, term: dict,
                           defn: dict | None = None) -> None:
        """owl:intersectionOf conjuncts: named classes -> parents,
        restriction conjuncts -> restrictions (reference ``_get_parents``
        handling of ``And`` expressions, ``term_collector.py:104-110``).
        ``defn``: when given, conjuncts are additionally recorded as one
        equivalence definition for the classifier."""
        inter = cls.find(f"{{{OWL}}}intersectionOf")
        if inter is None:
            return
        for member in inter.findall(f"{{{OWL}}}Class"):
            res2 = member.get(about_attr) or member.get(resource_attr)
            if res2 and res2 != OWL_THING:
                term["parents"][res2] = ""
                if defn is not None:
                    defn["named"].append(res2)
        for member in inter.findall(f"{{{RDF}}}Description"):
            res2 = member.get(about_attr)
            if res2 and res2 != OWL_THING:
                term["parents"][res2] = ""
                if defn is not None:
                    defn["named"].append(res2)
        for member in inter.findall(f"{{{OWL}}}Restriction"):
            add_restriction(member, term, defn)

    def parse_parents(node: ET.Element, term: dict) -> None:
        for sub in list(node.findall(f"{{{RDFS}}}subClassOf")) + list(
            node.findall(f"{{{RDFS}}}subPropertyOf")
        ):
            res = sub.get(resource_attr)
            if res:
                if res != OWL_THING:
                    term["parents"][res] = ""
                continue
            for restriction in sub.findall(f"{{{OWL}}}Restriction"):
                add_restriction(restriction, term)
            for cls in sub.findall(f"{{{OWL}}}Class"):
                parse_intersection(cls, term)
        # equivalentClass-embedded definitions (defined classes, e.g. most
        # of EFO): named conjuncts of the equivalent intersection become
        # parents, restriction conjuncts become restrictions — matching how
        # owlready2 surfaces defining axioms to the reference's parent walk
        # (``term_collector.py:93-132``). A plain named equivalent (rdf:
        # resource, no expression) is NOT a parent and is skipped.
        for eq in node.findall(f"{{{OWL}}}equivalentClass"):
            defn = {"named": [], "restrictions": {}}
            for restriction in eq.findall(f"{{{OWL}}}Restriction"):
                add_restriction(restriction, term, defn)
            for cls in eq.findall(f"{{{OWL}}}Class"):
                parse_intersection(cls, term, defn)
            named_eq = eq.get(resource_attr)
            if named_eq and named_eq != OWL_THING:
                # plain named equivalent: not a told parent (see above),
                # but a definition the classifier uses for A ≡ B
                defn["named"].append(named_eq)
            if defn["named"] or defn["restrictions"]:
                term["equiv"].append(defn)

    def parse_common(node: ET.Element, term: dict) -> None:
        for child in node:
            tag, txt = child.tag, (child.text or "").strip()
            if tag in _LABEL_PROPS and txt and txt not in term["labels"]:
                term["labels"].append(txt)
            elif tag in _SYNONYM_PROPS and txt and txt not in term["synonyms"]:
                term["synonyms"].append(txt)
            elif (
                tag == f"{{{SKOS}}}definition"
                or child.get(about_attr) == IAO_DEF
                or tag.endswith("IAO_0000115")
            ) and txt and txt not in term["definitions"]:
                term["definitions"].append(txt)
            elif tag == f"{{{OWL}}}deprecated" and txt.lower() == "true":
                term["deprecated"] = True

    def node_kind(node: ET.Element) -> str | None:
        """Map a top-level element to Class / property / NamedIndividual /
        Ontology, resolving the ``rdf:Description`` + ``rdf:type`` style
        (the serialization many real-world exporters emit) to the same
        kinds as directly-typed elements."""
        if node.tag != f"{{{RDF}}}Description":
            return node.tag
        for typ in node.findall(f"{{{RDF}}}type"):
            res = typ.get(resource_attr)
            if res == OWL + "Class":
                return f"{{{OWL}}}Class"
            if res in (
                OWL + "ObjectProperty",
                OWL + "DatatypeProperty",
                OWL + "AnnotationProperty",
            ):
                return "{" + OWL + "}" + res[len(OWL):]
            if res == OWL + "NamedIndividual":
                return f"{{{OWL}}}NamedIndividual"
            if res == OWL + "Ontology":
                return f"{{{OWL}}}Ontology"
        return None  # untyped Description: annotations only, skip

    def process_root(root: ET.Element) -> list[str]:
        """Extract terms from one parsed file; return its owl:imports IRIs."""
        imports: list[str] = []
        for node in root:
            iri = node.get(about_attr)
            kind = node_kind(node)
            if kind == f"{{{OWL}}}Ontology":
                for imp in node.findall(f"{{{OWL}}}imports"):
                    res = imp.get(resource_attr)
                    if res:
                        imports.append(res)
                continue
            if not iri or kind is None:
                continue
            if kind == f"{{{OWL}}}Class":
                t = get_term(iri, OntologyTermType.CLASS)
                parse_common(node, t)
                parse_parents(node, t)
            elif kind in _PROPERTY_TAGS:
                t = get_term(iri, OntologyTermType.PROPERTY)
                parse_common(node, t)
                parse_parents(node, t)
            elif kind == f"{{{OWL}}}NamedIndividual":
                label = ""
                for child in node:
                    if child.tag in _LABEL_PROPS and child.text:
                        label = child.text.strip()
                        break
                for typ in node.findall(f"{{{RDF}}}type"):
                    res = typ.get(resource_attr)
                    # the Description style also types the individual as
                    # owl:NamedIndividual itself — that's not a class
                    if res and res != OWL + "NamedIndividual":
                        instances_of.setdefault(res, []).append(iri)
                instance_labels[iri] = label
        return imports

    visited: set[str] = set()
    queue = [os.path.abspath(path)]
    while queue:
        p = queue.pop(0)
        if p in visited:
            continue
        visited.add(p)
        if _is_turtle(p):
            # Turtle/NTriples serialization (r2 VERDICT #7 — owlready2
            # accepts these in the reference, term_collector.py:343-346);
            # same assembly semantics, triple-based instead of DOM-based
            imports = _process_ttl(p, get_term, instances_of, instance_labels)
        else:
            root = ET.parse(p).getroot()
            if root.tag == f"{{{OWL}}}Ontology":
                # OWL/XML (functional-style XML, root owl:Ontology) — the
                # third serialization owlready2 tolerates
                imports = _process_owlxml(
                    root, terms, get_term, instances_of, instance_labels
                )
            else:
                imports = process_root(root)
        for imp_iri in imports:
            if not follow_imports:
                continue
            resolved = _resolve_import(imp_iri, os.path.dirname(p))
            if resolved is not None:
                queue.append(os.path.abspath(resolved))
            # unresolvable (remote) import: skipped — offline engine

    if use_reasoning:
        from ontology_mapper_spark.sources.reasoning import classify_terms

        classify_terms(terms)

    # label fallback + relation label resolution (reference onto_utils.py:65-69)
    for t in terms.values():
        if not t["labels"]:
            t["labels"] = [_frag(t["iri"])]
    for t in terms.values():
        t["parents"] = {
            p: (terms[p]["labels"][0] if p in terms else _frag(p))
            for p in t["parents"]
        }
        for p_iri in t["parents"]:
            if p_iri in terms:
                terms[p_iri]["children"][t["iri"]] = t["labels"][0]
        for cls_iri, insts in instances_of.items():
            if cls_iri == t["iri"]:
                for i in insts:
                    t["instances"][i] = instance_labels.get(i) or _frag(i)
    return list(terms.values())


def _is_turtle(path: str) -> bool:
    """Format sniff: extension first, then content (a Turtle file starts
    with a directive, a triple, or comments — never an XML declaration)."""
    lower = path.lower()
    if lower.endswith((".ttl", ".turtle", ".nt", ".n3")):
        return True
    if lower.endswith((".owl", ".rdf", ".xml")):
        return False
    # skip leading '#' comment lines (common in NTriples/license headers —
    # XML can't start with them) by READING LINES, not a fixed byte window:
    # real exporter headers routinely exceed any fixed sniff size
    head = ""
    try:
        with open(path, encoding="utf-8", errors="replace") as f:
            for _ in range(10_000):  # bounded: don't scan a broken file forever
                ln = f.readline()
                if not ln:
                    break
                stripped = ln.strip()
                if not stripped or stripped.startswith("#"):
                    continue
                head = stripped + "\n" + f.read(2048)
                break
    except OSError:
        return False
    head = head.lstrip()
    return head.startswith(("@prefix", "@base", "PREFIX", "BASE")) or (
        not head.startswith("<?xml") and not head.startswith("<rdf")
        and ("@prefix" in head or head.startswith("<http"))
    )


def _process_ttl(path, get_term, instances_of, instance_labels) -> list[str]:
    """Assemble onto_terms rows from one Turtle file's triples — the
    triple-based mirror of ``process_root``'s DOM walk (same property
    subset, same semantics; identical rows for the same ontology, pinned by
    the .ttl round-trip test)."""
    from ontology_mapper_spark.sources.turtle import RDF_TYPE, read_turtle

    spo = read_turtle(path)
    imports: list[str] = []

    def of_kind(po, pred, kind):
        return [o[1] for o in po.get(pred, []) if o[0] == kind]

    def add_restriction_b(b, term, defn=None):
        po = spo.get(b, {})
        on = of_kind(po, OWL + "onProperty", "iri")
        filler = of_kind(po, OWL + "someValuesFrom", "iri")
        if on and filler:
            term["restrictions"][on[0]] = filler[0]
            if defn is not None:
                defn["restrictions"][on[0]] = filler[0]

    def parse_intersection_b(b, term, defn=None):
        po = spo.get(b, {})
        for lst in po.get(OWL + "intersectionOf", []):
            if lst[0] != "list":
                continue
            for member in lst[1]:
                if member[0] == "iri" and member[1] != OWL_THING:
                    term["parents"][member[1]] = ""
                    if defn is not None:
                        defn["named"].append(member[1])
                elif member[0] == "bnode":
                    add_restriction_b(member[1], term, defn)

    def handle_parent_obj(obj, term, defn=None):
        if obj[0] == "iri":
            if obj[1] != OWL_THING:
                term["parents"][obj[1]] = ""
        elif obj[0] == "bnode":
            bpo = spo.get(obj[1], {})
            btypes = of_kind(bpo, RDF_TYPE, "iri")
            if OWL + "Restriction" in btypes:
                add_restriction_b(obj[1], term, defn)
            else:
                parse_intersection_b(obj[1], term, defn)

    prop_types = {
        OWL + "ObjectProperty",
        OWL + "DatatypeProperty",
        OWL + "AnnotationProperty",
    }
    label_preds, syn_preds, def_preds = (
        LABEL_IRIS, SYNONYM_IRIS, DEFINITION_IRIS
    )

    for s, po in spo.items():
        types = of_kind(po, RDF_TYPE, "iri")
        if OWL + "Ontology" in types:
            imports.extend(of_kind(po, OWL + "imports", "iri"))
            continue
        if s.startswith("_:"):
            continue
        if OWL + "NamedIndividual" in types:
            label = ""
            for lp in (RDFS + "label", SKOS + "prefLabel"):
                ls = of_kind(po, lp, "lit")
                if ls:
                    label = ls[0].strip()
                    break
            for t_iri in types:
                if t_iri != OWL + "NamedIndividual":
                    instances_of.setdefault(t_iri, []).append(s)
            instance_labels[s] = label
            continue
        if OWL + "Class" in types:
            term = get_term(s, OntologyTermType.CLASS)
        elif prop_types & set(types):
            term = get_term(s, OntologyTermType.PROPERTY)
        else:
            continue
        # annotation properties, in first-occurrence predicate order (the
        # triple map preserves document order) — mirrors parse_common
        for pred, objs in po.items():
            if pred in label_preds:
                for v in (o[1].strip() for o in objs if o[0] == "lit"):
                    if v and v not in term["labels"]:
                        term["labels"].append(v)
            elif pred in syn_preds:
                for v in (o[1].strip() for o in objs if o[0] == "lit"):
                    if v and v not in term["synonyms"]:
                        term["synonyms"].append(v)
            elif pred in def_preds:
                for v in (o[1].strip() for o in objs if o[0] == "lit"):
                    if v and v not in term["definitions"]:
                        term["definitions"].append(v)
            elif pred == OWL + "deprecated":
                if any(
                    o[0] == "lit" and o[1].strip().lower() == "true"
                    for o in objs
                ):
                    term["deprecated"] = True
        for pred in (RDFS + "subClassOf", RDFS + "subPropertyOf"):
            for obj in po.get(pred, []):
                handle_parent_obj(obj, term)
        # equivalentClass expressions: restrictions and intersection
        # conjuncts surface as parents/restrictions; plain named
        # equivalents are skipped as parents (same rule as parse_parents)
        # but recorded as definitions for the classifier
        for obj in po.get(OWL + "equivalentClass", []):
            defn = {"named": [], "restrictions": {}}
            if obj[0] == "bnode":
                handle_parent_obj(obj, term, defn)
            elif obj[0] == "iri" and obj[1] != OWL_THING:
                defn["named"].append(obj[1])
            if defn["named"] or defn["restrictions"]:
                term["equiv"].append(defn)
    return imports


def _process_owlxml(
    root, terms, get_term, instances_of, instance_labels
) -> list[str]:
    """Assemble onto_terms rows from an OWL/XML (functional-style XML)
    document — the third serialization owlready2 tolerates
    (``term_collector.py:343-346``). Covers the axiom subset the other two
    parsers read: declarations, SubClassOf (named / someValuesFrom /
    intersection superclasses), EquivalentClasses (same told-parent rules
    as ``parse_parents``), property hierarchies, annotation assertions
    (labels / synonyms / definitions / deprecated), class assertions,
    imports."""
    O = "{" + OWL + "}"
    onto_iri = (root.get("ontologyIRI") or "").rstrip("#/")
    prefixes: dict[str, str] = {}
    for pre in root.findall(f"{O}Prefix"):
        prefixes[pre.get("name") or ""] = pre.get("IRI") or ""

    def resolve(el) -> str | None:
        """IRI of an entity element (Class/ObjectProperty/... with IRI= or
        abbreviatedIRI=), or of an <IRI>/<AbbreviatedIRI> subject node."""
        if el is None:
            return None
        if el.tag in (f"{O}IRI", f"{O}AbbreviatedIRI"):
            raw = (el.text or "").strip()
            if el.tag == f"{O}AbbreviatedIRI":
                pfx, local = raw.split(":", 1)
                return prefixes.get(pfx, "") + local
            return onto_iri + raw if raw.startswith("#") else raw
        iri = el.get("IRI")
        if iri is not None:
            return onto_iri + iri if iri.startswith("#") else iri
        abbr = el.get("abbreviatedIRI")
        if abbr is not None:
            pfx, local = abbr.split(":", 1)
            return prefixes.get(pfx, "") + local
        return None

    _ANN_LABELS, _ANN_SYNS, _ANN_DEFS = (
        LABEL_IRIS, SYNONYM_IRIS, DEFINITION_IRIS
    )
    prop_decls = (f"{O}ObjectProperty", f"{O}DataProperty",
                  f"{O}AnnotationProperty")
    individuals: set[str] = set()
    imports: list[str] = []

    def some_values(expr) -> tuple[str, str] | None:
        if expr.tag != f"{O}ObjectSomeValuesFrom":
            return None
        kids = list(expr)
        if len(kids) == 2:
            p, f = resolve(kids[0]), resolve(kids[1])
            if p and f:
                return (p, f)
        return None

    def apply_superclass(expr, term, defn=None) -> None:
        if expr.tag == f"{O}Class":
            iri2 = resolve(expr)
            if iri2 and iri2 != OWL_THING:
                term["parents"][iri2] = ""
                if defn is not None:
                    defn["named"].append(iri2)
        elif expr.tag == f"{O}ObjectIntersectionOf":
            for member in expr:
                apply_superclass(member, term, defn)
        else:
            r = some_values(expr)
            if r is not None:
                term["restrictions"][r[0]] = r[1]
                if defn is not None:
                    defn["restrictions"][r[0]] = r[1]

    # pass 1: declarations (so annotation subjects resolve to the right
    # term type even when axioms precede/follow declarations)
    for decl in root.findall(f"{O}Declaration"):
        for ent in decl:
            iri = resolve(ent)
            if not iri:
                continue
            if ent.tag == f"{O}Class":
                get_term(iri, OntologyTermType.CLASS)
            elif ent.tag in prop_decls:
                get_term(iri, OntologyTermType.PROPERTY)
            elif ent.tag == f"{O}NamedIndividual":
                individuals.add(iri)
                instance_labels.setdefault(iri, "")

    term_for = get_term  # get_term memoizes in the shared registry

    def axiom_kids(node) -> list:
        """Axiom operands, with <Annotation> children dropped — annotated
        axioms (standard ROBOT/Protégé output) prepend one per annotation,
        and counting them as operands silently discards the axiom."""
        return [k for k in node if k.tag != f"{O}Annotation"]

    for node in root:
        tag = node.tag
        if tag == f"{O}Import":
            iri = (node.text or "").strip()
            if iri:
                imports.append(iri)
        elif tag == f"{O}SubClassOf":
            kids = axiom_kids(node)
            if len(kids) == 2 and kids[0].tag == f"{O}Class":
                sub = resolve(kids[0])
                if sub:
                    apply_superclass(kids[1],
                                     term_for(sub, OntologyTermType.CLASS))
        elif tag == f"{O}EquivalentClasses":
            kids = axiom_kids(node)
            for i, k in enumerate(kids):
                if k.tag != f"{O}Class":
                    continue
                sub = resolve(k)
                if not sub:
                    continue
                term = term_for(sub, OntologyTermType.CLASS)
                defn = {"named": [], "restrictions": {}}
                for j, other in enumerate(kids):
                    if j == i:
                        continue
                    if other.tag == f"{O}Class":
                        # plain named equivalent: definition only, not a
                        # told parent (same rule as parse_parents)
                        iri2 = resolve(other)
                        if iri2 and iri2 != OWL_THING:
                            defn["named"].append(iri2)
                    else:
                        apply_superclass(other, term, defn)
                if defn["named"] or defn["restrictions"]:
                    term["equiv"].append(defn)
        elif tag in (f"{O}SubObjectPropertyOf", f"{O}SubDataPropertyOf",
                     f"{O}SubAnnotationPropertyOf"):
            kids = axiom_kids(node)
            if len(kids) == 2:
                sub, sup = resolve(kids[0]), resolve(kids[1])
                if sub and sup:
                    term_for(sub, OntologyTermType.PROPERTY)["parents"][sup] = ""
        elif tag == f"{O}ClassAssertion":
            kids = axiom_kids(node)
            if len(kids) == 2:
                cls, inst = resolve(kids[0]), resolve(kids[1])
                if cls and inst:
                    individuals.add(inst)
                    instance_labels.setdefault(inst, "")
                    instances_of.setdefault(cls, []).append(inst)
        elif tag == f"{O}AnnotationAssertion":
            kids = axiom_kids(node)
            if len(kids) != 3:
                continue
            prop = resolve(kids[0])
            subj = resolve(kids[1])
            lit = (kids[2].text or "").strip() \
                if kids[2].tag == f"{O}Literal" else ""
            if not prop or not subj or not lit:
                continue
            if subj in individuals:
                if prop in _ANN_LABELS and not instance_labels.get(subj):
                    instance_labels[subj] = lit
                continue
            if subj not in terms:
                # undeclared subject (e.g. an ontology-level annotation):
                # do not spawn a phantom class term for it
                continue
            term = terms[subj]
            if prop in _ANN_LABELS and lit not in term["labels"]:
                term["labels"].append(lit)
            elif prop in _ANN_SYNS and lit not in term["synonyms"]:
                term["synonyms"].append(lit)
            elif prop in _ANN_DEFS and lit not in term["definitions"]:
                term["definitions"].append(lit)
            elif prop == OWL + "deprecated" and lit.lower() == "true":
                term["deprecated"] = True
    return imports


def write_ttl(rows: list[dict], path: str, ontology_iri: str = "") -> None:
    """Serialize onto_terms rows as Turtle — the .ttl twin of ``write_owl``
    (same subset; ``parse_owl`` reads both back to identical rows)."""

    def q(s: str) -> str:
        # Turtle STRING_LITERAL_QUOTE forbids raw LF/CR; escape control
        # whitespace too so other parsers (rdflib/ROBOT) accept the output
        return '"' + (
            s.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        ) + '"'

    out = [
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .",
        f"@prefix rdfs: <{RDFS}> .",
        f"@prefix owl: <{OWL}> .",
        f"@prefix skos: <{SKOS}> .",
        f"@prefix oboInOwl: <{OBOINOWL}> .",
        "",
    ]
    if ontology_iri:
        out.append(f"<{ontology_iri}> a owl:Ontology .")
        out.append("")
    instance_rows = []
    for r in rows:
        kind = (
            "owl:Class"
            if r["term_type"] == OntologyTermType.CLASS
            else "owl:ObjectProperty"
        )
        lines = [f"<{r['iri']}> a {kind}"]
        for i, lbl in enumerate(r["labels"]):
            prop = "rdfs:label" if i == 0 else "skos:prefLabel"
            lines.append(f"    {prop} {q(lbl)}")
        for syn in r["synonyms"]:
            lines.append(f"    oboInOwl:hasExactSynonym {q(syn)}")
        for d in r["definitions"]:
            lines.append(f"    skos:definition {q(d)}")
        sub = (
            "rdfs:subClassOf"
            if r["term_type"] == OntologyTermType.CLASS
            else "rdfs:subPropertyOf"
        )
        for p in r["parents"]:
            lines.append(f"    {sub} <{p}>")
        for prop, filler in r.get("restrictions", {}).items():
            lines.append(
                f"    {sub} [ a owl:Restriction ; owl:onProperty <{prop}> ; "
                f"owl:someValuesFrom <{filler}> ]"
            )
        if r["deprecated"]:
            lines.append("    owl:deprecated true")
        out.append(" ;\n".join(lines) + " .")
        for inst_iri, inst_label in r.get("instances", {}).items():
            instance_rows.append((inst_iri, inst_label, r["iri"]))
    for inst_iri, inst_label, cls_iri in instance_rows:
        lines = [f"<{inst_iri}> a owl:NamedIndividual, <{cls_iri}>"]
        if inst_label:
            lines.append(f"    rdfs:label {q(inst_label)}")
        out.append(" ;\n".join(lines) + " .")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")


def write_owl(rows: list[dict], path: str, ontology_iri: str = "") -> None:
    """Serialize onto_terms rows to the RDF/XML subset ``parse_owl`` reads."""
    out = [
        '<?xml version="1.0"?>',
        f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:rdfs="{RDFS}" xmlns:owl="{OWL}"',
        f'         xmlns:skos="{SKOS}" xmlns:oboInOwl="{OBOINOWL}">',
    ]
    if ontology_iri:
        out.append(f'  <owl:Ontology rdf:about="{escape(ontology_iri)}"/>')
    instance_rows = []
    for r in rows:
        tag = (
            "owl:Class"
            if r["term_type"] == OntologyTermType.CLASS
            else "owl:ObjectProperty"
        )
        out.append(f'  <{tag} rdf:about="{escape(r["iri"])}">')
        for i, lbl in enumerate(r["labels"]):
            prop = "rdfs:label" if i == 0 else "skos:prefLabel"
            out.append(f"    <{prop}>{escape(lbl)}</{prop}>")
        for syn in r["synonyms"]:
            out.append(
                f"    <oboInOwl:hasExactSynonym>{escape(syn)}"
                "</oboInOwl:hasExactSynonym>"
            )
        for d in r["definitions"]:
            out.append(f"    <skos:definition>{escape(d)}</skos:definition>")
        sub = (
            "rdfs:subClassOf"
            if r["term_type"] == OntologyTermType.CLASS
            else "rdfs:subPropertyOf"
        )
        for p in r["parents"]:
            out.append(f'    <{sub} rdf:resource="{escape(p)}"/>')
        for prop, filler in r.get("restrictions", {}).items():
            out.append(f"    <{sub}>")
            out.append("      <owl:Restriction>")
            out.append(f'        <owl:onProperty rdf:resource="{escape(prop)}"/>')
            out.append(
                f'        <owl:someValuesFrom rdf:resource="{escape(filler)}"/>'
            )
            out.append("      </owl:Restriction>")
            out.append(f"    </{sub}>")
        if r["deprecated"]:
            out.append(
                '    <owl:deprecated rdf:datatype='
                '"http://www.w3.org/2001/XMLSchema#boolean">true'
                "</owl:deprecated>"
            )
        out.append(f"  </{tag}>")
        for inst_iri, inst_label in r.get("instances", {}).items():
            instance_rows.append((inst_iri, inst_label, r["iri"]))
    for inst_iri, inst_label, cls_iri in instance_rows:
        out.append(f'  <owl:NamedIndividual rdf:about="{escape(inst_iri)}">')
        out.append(f'    <rdf:type rdf:resource="{escape(cls_iri)}"/>')
        if inst_label:
            out.append(f"    <rdfs:label>{escape(inst_label)}</rdfs:label>")
        out.append("  </owl:NamedIndividual>")
    out.append("</rdf:RDF>")
    with open(path, "w") as f:
        f.write("\n".join(out))
