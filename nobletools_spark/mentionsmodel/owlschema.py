"""Derive a :class:`DomainSchema` from a NobleMentions-shaped domain
ontology (the blulab Schema.owl model) instead of hand-transcribing
``VariableDef`` rows.

Reference semantics re-expressed (file:line cites into the Java source):

- schema roots — ``DomainOntology.java:59-67``: anchors live under
  ``Anchor``/``PseudoAnchor``, compounds under ``CompoundAnchor``,
  modifiers under ``Modifier``/``PseudoModifier``/``Closure``,
  variables under ``Annotation``.
- annotation variables — ``DomainOntology.getAnnotationVariables:
  1263-1272``: every class reachable through an anchor class's
  ``isAnchorOf`` restrictions becomes a variable anchored there.
- satisfaction slots — ``AnnotationVariable.isSatisfied:146-148`` and
  ``findMissingDefinedProperties:184-196``: the variable class's
  ``owl:equivalentClass`` restriction list defines one slot per
  restriction; a ``prop some Filler`` restriction over modifier-subtree
  fillers is a required modifier slot (property name minus the ``has``
  prefix is the ConText modifier type — ``DomainOntology.getProperty:
  1005-1010`` tries both spellings), over annotation-subtree fillers a
  defining relation slot. ``hasAnchor``/``hasSection``/structural
  properties are carried by the pipeline itself and skipped
  (``AnnotationVariable.getAnnotations:129-132`` skips HAS_SECTION).
- allowed values — restriction parameters evaluate against a modifier
  class OR ITS SUBCLASSES (``ILogicExpression.evaluate`` via
  ``hasSubClass``, as in ``DomainOntology.getPossibleCompoundAnchor
  Arguments:829-845``), so fillers expand through the subclass closure
  at schema-build time; a filler that IS the modifier-type root means
  "any value" (empty allowed tuple).
- compound anchors — ``DomainOntology.getCompoundAnchorMap:853-867``:
  subclasses of ``CompoundAnchor`` declare ``hasCompoundArgumentN``
  restrictions (numbered subproperties of ``hasCompoundArgument``,
  ``DomainOntology.java:78,760-764``); each restriction is one slot and
  its ``someValuesFrom`` expression flattens to the slot's alternative
  component classes (``getContainedClasses:876-887``). A compound is
  found when every slot is fillable by a distinct mentioned class
  (``getCompoundAnchors:708-790`` builds the instance and evaluates the
  equivalent restrictions).
- most-specific-wins — a variable whose named superclass is itself a
  variable shadows it on identical spans (``NobleMentions.process:
  178-195``), captured as ``specific_of``.

Parsing is the same stdlib-ElementTree RDF/XML subset as
``terminology.loaders`` (the container has no OWL-API/rdflib), with
``owl:imports`` resolved through an injected map — no network.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..terminology.loaders import _frag, _OWL, _RDF, _RDFS
from .composition import DomainSchema, VariableDef

ANCHOR = "Anchor"
PSEUDO_ANCHOR = "PseudoAnchor"
COMPOUND_ANCHOR = "CompoundAnchor"
ANNOTATION = "Annotation"
MODIFIER_ROOTS = ("Modifier", "PseudoModifier", "Closure")
IS_ANCHOR_OF = "isAnchorOf"
HAS_ANCHOR = "hasAnchor"
HAS_COMPOUND_ARGUMENT = "hasCompoundArgument"
# structural properties the pipeline itself provides; never slots
# (DomainOntology.java:70-103 property constants)
_SKIP_PROPS = frozenset({
    HAS_ANCHOR, "hasSection", "hasSpan", "hasAnnotationText",
    "hasAnnotationType", "hasTitle", "hasText",
})


@dataclass(frozen=True)
class Restriction:
    prop: str
    fillers: tuple[str, ...]     # named classes flattened from the body
    source: str                  # "equivalent" | "subclass"


@dataclass
class DomainOwl:
    """Parsed view of a domain ontology document (+import closure)."""
    parents: dict[str, list[str]] = field(default_factory=dict)
    restrictions: dict[str, list[Restriction]] = field(default_factory=dict)
    prop_parents: dict[str, list[str]] = field(default_factory=dict)
    classes: list[str] = field(default_factory=list)

    def children_map(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for c, ps in self.parents.items():
            for p in ps:
                out.setdefault(p, []).append(c)
        return out

    def descendants(self, root: str, with_self: bool = True) -> set[str]:
        children = self.children_map()
        seen: set[str] = set()
        stack = [root]
        while stack:
            cls = stack.pop()
            if cls in seen:
                continue
            seen.add(cls)
            stack.extend(children.get(cls, ()))
        if not with_self:
            seen.discard(root)
        return seen

    def is_subproperty_of(self, prop: str, root: str) -> bool:
        seen: set[str] = set()
        stack = [prop]
        while stack:
            p = stack.pop()
            if p == root:
                return True
            if p in seen:
                continue
            seen.add(p)
            stack.extend(self.prop_parents.get(p, ()))
        return False

    def own_and_inherited(self, cls: str) -> list[Restriction]:
        """Restrictions on ``cls`` plus those inherited through named
        superclasses (OWL-API ``getRestrictions`` walks the
        hierarchy)."""
        out: list[Restriction] = []
        seen: set[str] = set()
        stack = [cls]
        while stack:
            c = stack.pop()
            if c in seen:
                continue
            seen.add(c)
            out.extend(self.restrictions.get(c, ()))
            stack.extend(self.parents.get(c, ()))
        return out


def _contained_classes(node) -> list[str]:
    """Flatten every named class in an expression body — the analog of
    ``DomainOntology.getContainedClasses:876-887`` (recursive walk over
    union/intersection/nested class nodes)."""
    found: list[str] = []
    about = node.get(_RDF + "about") or node.get(_RDF + "resource")
    if about:
        found.append(_frag(about))
    for child in node:
        if child.tag == _OWL + "Restriction":
            continue  # nested restrictions contribute via their own slot
        found.extend(_contained_classes(child))
    return found


def _parse_restriction(node) -> Restriction | None:
    prop = None
    fillers: list[str] = []
    for child in node:
        if child.tag == _OWL + "onProperty":
            res = child.get(_RDF + "resource")
            if res:
                prop = _frag(res)
        elif child.tag in (_OWL + "someValuesFrom", _OWL + "allValuesFrom",
                           _OWL + "hasValue"):
            res = child.get(_RDF + "resource")
            if res:
                fillers.append(_frag(res))
            else:
                for sub in child:
                    fillers.extend(_contained_classes(sub))
    if prop is None:
        return None
    return Restriction(prop, tuple(dict.fromkeys(fillers)), "")


def parse_domain_owl(xml_text: str,
                     imports: dict[str, str] | None = None) -> DomainOwl:
    """Parse the document and its (injected) import closure into named
    subclass edges, per-class restrictions with provenance, and the
    object-property hierarchy."""
    import xml.etree.ElementTree as ET

    owl = DomainOwl()
    seen_uris: set[str] = set()
    stack = [ET.fromstring(xml_text)]
    while stack:
        root = stack.pop()
        for ont in root.iter(_OWL + "Ontology"):
            for imp in ont.findall(_OWL + "imports"):
                uri = imp.get(_RDF + "resource")
                if uri and uri not in seen_uris:
                    seen_uris.add(uri)
                    if imports is None or uri not in imports:
                        raise ValueError(f"unresolved owl:imports {uri}")
                    stack.append(ET.fromstring(imports[uri]))
        for prop in root.iter(_OWL + "ObjectProperty"):
            about = prop.get(_RDF + "about") or prop.get(_RDF + "ID")
            if not about:
                continue
            name = _frag(about)
            for sup in prop.findall(_RDFS + "subPropertyOf"):
                res = sup.get(_RDF + "resource")
                if res:
                    owl.prop_parents.setdefault(name, []).append(_frag(res))
        for cls in root.iter(_OWL + "Class"):
            about = cls.get(_RDF + "about") or cls.get(_RDF + "ID")
            if not about:
                continue
            cui = _frag(about)
            owl.classes.append(cui)
            for child in cls:
                if child.tag == _RDFS + "subClassOf":
                    res = child.get(_RDF + "resource")
                    if res:
                        owl.parents.setdefault(cui, []).append(_frag(res))
                    else:
                        for r_node in child.iter(_OWL + "Restriction"):
                            r = _parse_restriction(r_node)
                            if r:
                                owl.restrictions.setdefault(cui, []).append(
                                    Restriction(r.prop, r.fillers,
                                                "subclass"))
                elif child.tag == _OWL + "equivalentClass":
                    for r_node in child.iter(_OWL + "Restriction"):
                        r = _parse_restriction(r_node)
                        if r:
                            owl.restrictions.setdefault(cui, []).append(
                                Restriction(r.prop, r.fillers, "equivalent"))
    return owl


def domain_schema_from_owl(xml_text: str,
                           imports: dict[str, str] | None = None,
                           ) -> DomainSchema:
    """Domain ontology document -> :class:`DomainSchema`, with zero
    hand-transcribed rules. Pair with ``terminology.loaders.load_owl``
    over the same document to build the anchor dictionary (class tree ->
    concepts + isa edges) so ``compose`` sees consistent CUIs."""
    owl = parse_domain_owl(xml_text, imports)

    annotations = owl.descendants(ANNOTATION, with_self=False)

    # anchor class -> variables it anchors (getAnnotationVariables)
    anchored_by: dict[str, list[str]] = {}
    anchor_universe = (owl.descendants(ANCHOR, with_self=False)
                       | owl.descendants(PSEUDO_ANCHOR, with_self=False))
    for anchor in sorted(anchor_universe):
        for r in owl.own_and_inherited(anchor):
            if r.prop == IS_ANCHOR_OF:
                for var in r.fillers:
                    anchored_by.setdefault(var, []).append(anchor)

    def allowed_values(fillers: tuple[str, ...], mtype: str) -> tuple[str, ...]:
        if mtype in fillers:          # `prop some <type root>` = any value
            return ()
        vals: list[str] = []
        for f in fillers:
            for v in sorted(owl.descendants(f, with_self=True)):
                if v not in vals:
                    vals.append(v)
        return tuple(vals)

    variables: list[VariableDef] = []
    for var in sorted(annotations):
        required: list[tuple[str, tuple[str, ...]]] = []
        relations: list[tuple[str, str]] = []
        anchor_cuis: tuple[str, ...] = tuple(anchored_by.get(var, ()))
        for r in owl.restrictions.get(var, ()):
            if r.source != "equivalent":
                continue
            if r.prop == HAS_ANCHOR:
                # the declarative anchor set wins over the isAnchorOf
                # inverse when both are present (they agree in the
                # blulab ontologies; hasAnchor is what isSatisfied
                # actually evaluates)
                anchor_cuis = r.fillers
                continue
            if r.prop in _SKIP_PROPS:
                continue
            if r.fillers and all(f in annotations for f in r.fillers):
                for f in r.fillers:
                    relations.append((r.prop, f))
            else:
                mtype = (r.prop[3:] if r.prop.startswith("has")
                         else r.prop)
                required.append((mtype, allowed_values(r.fillers, mtype)))
        if not anchor_cuis and not required and not relations:
            continue  # structural class, not a variable
        specific_of = next(
            (p for p in owl.parents.get(var, ()) if p in annotations),
            None)
        variables.append(VariableDef(
            name=var, anchor_cuis=anchor_cuis,
            required=tuple(required), relations=tuple(relations),
            specific_of=specific_of))

    for comp in sorted(owl.descendants(COMPOUND_ANCHOR, with_self=False)):
        slots: list[tuple[str, ...]] = []
        rs = [r for r in owl.own_and_inherited(comp)
              if owl.is_subproperty_of(r.prop, HAS_COMPOUND_ARGUMENT)]
        # numbered subproperties order the slots (hasCompoundArgument1..5,
        # DomainOntology.getCompoundAnchors:760-764)
        for r in sorted(rs, key=lambda r: r.prop):
            if r.fillers:
                slots.append(r.fillers)
        if slots:
            variables.append(VariableDef(
                name=comp, anchor_cuis=(),
                component_slots=tuple(slots)))

    return DomainSchema(variables=variables)


def generate_domain_owl(anchors: "Sequence[str]",
                        variable: str = "DataOpMention",
                        required_modifiers: "Sequence[str]" = ("Polarity",),
                        base: str = "http://example.org/nobletools/Generated.owl",
                        ) -> str:
    """Emit a self-contained NobleMentions-shaped domain ontology document
    declaring one annotation variable anchored by every class in
    ``anchors`` and requiring one ConText modifier slot per entry of
    ``required_modifiers`` (any value — the restriction filler is the
    modifier-type root itself).

    This is the writer half of the schema round trip: a driver that wants
    "variable X over these dictionary concepts with these modifier slots"
    declares it as OWL and derives the :class:`DomainSchema` through
    :func:`domain_schema_from_owl` — the same parse path a user-supplied
    blulab Schema.owl/Domain.owl pair takes (reference semantics in
    ``DomainOntology.java:59-67,1263-1272``) — instead of hand-building
    ``VariableDef`` rows the reference has no analog for. Fragment names
    must be XML NCNames (CUIs are).
    """
    from xml.sax.saxutils import quoteattr

    def clause(tag: str, ref: str) -> str:
        return f"    <{tag} rdf:resource={quoteattr('#' + ref)}/>"

    lines = [
        '<?xml version="1.0"?>',
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
        '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"',
        '         xmlns:owl="http://www.w3.org/2002/07/owl#"',
        f'         xml:base={quoteattr(base)}>',
        f'  <owl:Ontology rdf:about={quoteattr(base)}/>',
    ]
    for root in (ANCHOR, PSEUDO_ANCHOR, COMPOUND_ANCHOR, ANNOTATION,
                 *MODIFIER_ROOTS):
        lines.append(f'  <owl:Class rdf:about={quoteattr("#" + root)}/>')
    for prop in (IS_ANCHOR_OF, HAS_ANCHOR, "hasModifier"):
        lines.append(
            f'  <owl:ObjectProperty rdf:about={quoteattr("#" + prop)}/>')
    for mtype in required_modifiers:
        lines += [
            f'  <owl:ObjectProperty rdf:about={quoteattr("#has" + mtype)}>',
            clause("rdfs:subPropertyOf", "hasModifier"),
            '  </owl:ObjectProperty>',
            f'  <owl:Class rdf:about={quoteattr("#" + mtype)}>',
            clause("rdfs:subClassOf", "Modifier"),
            '  </owl:Class>',
        ]
    for cui in anchors:
        lines += [
            f'  <owl:Class rdf:about={quoteattr("#" + cui)}>',
            clause("rdfs:subClassOf", ANCHOR),
            '    <rdfs:subClassOf>',
            '      <owl:Restriction>',
            f'        <owl:onProperty rdf:resource={quoteattr("#" + IS_ANCHOR_OF)}/>',
            f'        <owl:someValuesFrom rdf:resource={quoteattr("#" + variable)}/>',
            '      </owl:Restriction>',
            '    </rdfs:subClassOf>',
            '  </owl:Class>',
        ]
    lines.append(f'  <owl:Class rdf:about={quoteattr("#" + variable)}>')
    lines.append(clause("rdfs:subClassOf", ANNOTATION))
    for mtype in required_modifiers:
        lines += [
            '    <owl:equivalentClass>',
            '      <owl:Restriction>',
            f'        <owl:onProperty rdf:resource={quoteattr("#has" + mtype)}/>',
            f'        <owl:someValuesFrom rdf:resource={quoteattr("#" + mtype)}/>',
            '      </owl:Restriction>',
            '    </owl:equivalentClass>',
        ]
    lines += ['  </owl:Class>', '</rdf:RDF>', '']
    return "\n".join(lines)
