from .ast import (  # noqa: F401
    Bool,
    ConstantScore,
    DisjunctionMax,
    Fuzzy,
    MatchAll,
    Phrase,
    Prefix,
    Query,
    Term,
    Wildcard,
)
from .parser import parse_multi_field, parse_query  # noqa: F401
from .synonyms import expand_synonyms, parse_wordnet_prolog  # noqa: F401
from .percolate import (  # noqa: F401
    guard_terms,
    match_expr,
    percolate,
    percolate_indexed,
)
