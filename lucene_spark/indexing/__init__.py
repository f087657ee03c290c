from .addindexes import add_indexes, merge_indexes_tool  # noqa: F401
from .build import build_index  # noqa: F401
from .commits import (  # noqa: F401
    KeepAllCommits, KeepLastNCommits, KeepOnlyLastCommit, apply_policy,
    commit_point, list_commits, purge_unreferenced, read_commit,
    referenced_segments)
from .merge import compact_segments, merge_index  # noqa: F401
from .plan import make_build_plan, read_build_plan  # noqa: F401
from .reader import IndexReader  # noqa: F401
from .splitter import (  # noqa: F401
    list_segments,
    remove_segments,
    split_by_docs,
    split_segments,
)
from .writer import IndexWriter  # noqa: F401
from .validate import validate_index  # noqa: F401
