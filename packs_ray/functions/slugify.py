"""Column-name slugifier.

Reference: ``soda_pack/main.py:45`` runs every incoming frame through
``replace_whitespaces_with_underscores(df_raw)`` and keeps the returned
``column_name_association`` (slug -> original name) so check results,
which SodaCL reports against the slugified name, can be mapped back to
the user's original column (``soda_pack/main.py:79-80``:
``column_name_association.get(source_column)``).

Ray-Data shape: renaming is schema metadata — ``Dataset.rename_columns``
is a zero-copy per-block rename, no shuffle, no row rewrite — so this
costs one pass of Arrow metadata edits regardless of table size.
"""

from __future__ import annotations

import re

_WS = re.compile(r"\s")


def slugify_name(name: str) -> str:
    """Replace every whitespace character with an underscore."""
    return _WS.sub("_", name)


def slugify_columns(ds):
    """Slugify a Dataset's column names.

    Returns ``(renamed_ds, association)`` where ``association`` maps the
    slugified name back to the original (the reference's
    ``column_name_association``).  Two distinct originals that collide
    after slugification ('a b' and 'a_b') get deterministic ``__2``,
    ``__3``... suffixes in first-seen column order so the rename stays
    bijective.
    """
    schema = ds.schema()
    if schema is None:  # 0-block dataset (e.g. empty parquet input)
        return ds, {}
    names = schema.names
    mapping: dict[str, str] = {}
    assoc: dict[str, str] = {}
    for name in names:
        slug = slugify_name(name)
        if slug in assoc:
            i = 2
            while f"{slug}__{i}" in assoc:
                i += 1
            slug = f"{slug}__{i}"
        mapping[name] = slug
        assoc[slug] = name
    if all(k == v for k, v in mapping.items()):
        return ds, assoc
    return ds.rename_columns(mapping), assoc
