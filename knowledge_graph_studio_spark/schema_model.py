"""KG schema / rules model + the default test schema and gazetteer.

Mirrors the reference's Pydantic shapes (schemas/schemas.py:26-35,
models/common.py:152-229, schemas/rules.py:14-44) as plain dataclasses — these
are tiny driver-side config objects that get broadcast to executors.

The default schema mirrors the reference demo fixture
(src/whyhow_api/data/schema.json): entities person/company/service, relations
"runs" / "has service", patterns (person)-[runs]->(company),
(company)-[has service]->(service) — extended with location/investor entities so
the corpus exercises >2 patterns and a hot-key skew entity.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SchemaEntity:
    name: str
    description: str = ""
    # field name -> property keys (models/common.py:152-166)
    fields: dict[str, list[str]] = field(default_factory=dict)


@dataclass(frozen=True)
class SchemaRelation:
    name: str
    description: str = ""


@dataclass(frozen=True)
class SchemaPattern:
    head_type: str
    relation: str
    tail_type: str
    description: str = ""
    # trigger phrases for the deterministic extractor (stand-in for the LLM
    # prompt in utilities/config.py:225-248); default = relation name.
    triggers: tuple[str, ...] = ()

    def as_dict(self) -> dict:
        return {
            "head_type": self.head_type,
            "relation": self.relation,
            "tail_type": self.tail_type,
            "triggers": list(self.triggers) or [self.relation.replace("_", " ").lower()],
        }


@dataclass(frozen=True)
class MergeNodesRule:
    """services/crud/rule.py:141-156 / schemas/rules.py:20-26."""
    from_node_names: tuple[str, ...]
    to_node_name: str
    node_type: str
    rule_type: str = "merge_nodes"


@dataclass
class KGSchema:
    entities: list[SchemaEntity]
    relations: list[SchemaRelation]
    patterns: list[SchemaPattern]

    def pattern_dicts(self) -> list[dict]:
        return [p.as_dict() for p in self.patterns]


# --------------------------------------------------------------------------- #
# Default fixture schema + gazetteer (seeds the deterministic corpus)
# --------------------------------------------------------------------------- #

PEOPLE = [
    "Ada Lovelace", "Grace Hopper", "Alan Turing", "Edsger Dijkstra",
    "Barbara Liskov", "Donald Knuth", "Margaret Hamilton", "John McCarthy",
    "Frances Allen", "Tony Hoare", "Leslie Lamport", "Shafi Goldwasser",
]

COMPANIES = [
    "OpenAI", "Acme Corp", "Globex", "Initech", "Umbrella Labs", "Hooli",
    "Stark Industries", "Wayne Enterprises", "Tyrell Corp", "Cyberdyne",
]

SERVICES = [
    "cloud hosting", "graph search", "vector indexing", "data labeling",
    "model serving", "web crawling", "entity resolution", "log analytics",
]

CITIES = [
    "London", "Berlin", "Tokyo", "Austin", "Toronto", "Lisbon", "Nairobi",
    "Seoul",
]

# Alias surfaces exercising the L1 merge-nodes rule + L7 fuzzy clustering.
COMPANY_ALIASES = {
    "OpenAI": ["Open AI", "OpenAI Inc"],
    "Globex": ["Globex Corporation"],
    "Initech": ["Initech LLC"],
    "Cyberdyne": ["Cyberdyne Systems"],
}

HOT_ENTITY = "OpenAI"  # planted in ~20% of pages (FIXTURES.md §1 skew clause)


def default_schema() -> KGSchema:
    return KGSchema(
        entities=[
            SchemaEntity("person", "a named person",
                         {"CEO": ["CEO Age", "CEO Length with Business"]}),
            SchemaEntity("company", "a business",
                         {"Company": ["Location", "Number of Employees"]}),
            SchemaEntity("service", "a product or service"),
            SchemaEntity("city", "a location"),
        ],
        relations=[
            SchemaRelation("runs", "person leads company"),
            SchemaRelation("has service", "company offers service"),
            SchemaRelation("located in", "company HQ city"),
            SchemaRelation("acquired", "company bought company"),
        ],
        patterns=[
            SchemaPattern("person", "runs", "company",
                          triggers=("runs", "leads", "is the ceo of", "founded")),
            SchemaPattern("company", "has service", "service",
                          triggers=("offers", "provides", "sells", "has service")),
            SchemaPattern("company", "located in", "city",
                          triggers=("is headquartered in", "is based in", "located in")),
            SchemaPattern("company", "acquired", "company",
                          triggers=("acquired", "bought", "took over")),
        ],
    )


def default_gazetteer() -> dict[str, tuple[str, str]]:
    """lowercase surface -> (canonical, type); includes alias surfaces."""
    gaz: dict[str, tuple[str, str]] = {}
    for p in PEOPLE:
        gaz[p.lower()] = (p, "person")
    for c in COMPANIES:
        gaz[c.lower()] = (c, "company")
        for alias in COMPANY_ALIASES.get(c, []):
            # alias keeps its own canonical name: canonicalization (L1 rules +
            # connected components) must merge it, not the extractor.
            gaz[alias.lower()] = (alias, "company")
    for s in SERVICES:
        gaz[s.lower()] = (s, "service")
    for c in CITIES:
        gaz[c.lower()] = (c, "city")
    return gaz


def default_rules() -> list[MergeNodesRule]:
    """Alias -> canonical merge rules (subset; the rest is left to fuzzy+CC)."""
    return [
        MergeNodesRule(tuple(aliases), canonical, "company")
        for canonical, aliases in sorted(COMPANY_ALIASES.items())
    ]
