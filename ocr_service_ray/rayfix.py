"""Runtime workaround for a Ray Data 2.49 hash-shuffle schema race.

``_shuffle_block`` (ray/data/_internal/execution/operators/
hash_shuffle.py:223) returns early for a zero-row input block WITHOUT
disseminating the block's schema to the aggregators — but the operator
consumes its one-shot ``_has_schemas_broadcasted`` flag when it SUBMITS
the first shuffle task (hash_shuffle.py:584), before knowing whether
that block is empty. When the first-submitted block happens to be
empty, the schema broadcast is silently lost; every partition that then
receives no data shards finalizes as a zero-COLUMN table
(``ArrowBlockBuilder().build()`` of nothing) and a downstream join
raises ``ArrowInvalid: No match or multiple matches for key field
reference`` from inside ``HashShuffleAggregator.finalize``. Whether a
join succeeds therefore depends on block ARRIVAL ORDER — flaky by
scheduling, and guaranteed to bite sparse datasets (a candidate-pair
table with one non-empty block among many empties).

``apply()`` rebinds ``hash_shuffle._shuffle_block`` to a wrapper that
keeps the upstream behavior in every other case but, for an empty
block with a known schema when ``send_empty_blocks`` is set, fans the
schema-bearing empty shards out to every aggregator exactly as the
non-empty path would (hash_shuffle.py:251-258). Idempotent; a no-op
(returning False) if Ray's internals ever change shape, so an upgrade
degrades to upstream behavior instead of crashing.
"""

from __future__ import annotations

_applied = False


def apply() -> bool:
    """Install the patch once per process. Returns True when active."""
    global _applied
    if _applied:
        return True
    try:
        import ray
        from ray.data._internal.execution.operators import (
            hash_shuffle as hs,
        )
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType

        orig = hs._shuffle_block._function  # unwrapped python function
        # names the wrapper leans on — fail closed if any is missing
        hs._create_empty_table
        hs.TableBlockAccessor.try_convert_block_type
    except Exception:
        return False

    def _shuffle_block_schema_safe(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks: bool = False,
        override_partition_id=None,
    ):
        stats = BlockExecStats.builder()
        if block_transformer is not None:
            block = block_transformer(block)
        block = hs.TableBlockAccessor.try_convert_block_type(
            block, block_type=BlockType.ARROW
        )
        if (
            block.num_rows == 0
            and send_empty_blocks
            and len(block.schema) > 0
        ):
            # upstream would return here WITHOUT broadcasting — fan the
            # schema-bearing empty shard out to every partition instead
            empty = hs._create_empty_table(block.schema)
            ray.get(
                [
                    pool.get_aggregator_for_partition(pid).submit.remote(
                        input_index, pid, ray.put(empty)
                    )
                    for pid in range(pool.num_partitions)
                ]
            )
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return (meta, {})
        # transformer already applied and block already Arrow — pass
        # None so upstream doesn't re-apply it
        return orig(
            block,
            input_index,
            key_columns,
            pool,
            None,
            send_empty_blocks,
            override_partition_id,
        )

    _shuffle_block_schema_safe.__name__ = "_shuffle_block"
    hs._shuffle_block = ray.remote(_shuffle_block_schema_safe)

    # Driver-side half of the fix: the operator consumes its one-shot
    # broadcast flag at SUBMISSION (hash_shuffle.py:589) — if the first
    # submitted block is a zero-COLUMN empty (a map_batches output for
    # an empty input block carries no schema at all), even the patched
    # task above has nothing to broadcast and the flag is burned. Undo
    # the flag when the submitted bundle could not possibly have
    # carried a schema, so a later schema-bearing block re-triggers the
    # broadcast. (Single-block bundles only — the streaming executor's
    # norm; multi-block bundles keep upstream behavior.)
    orig_add = hs.HashShufflingOperatorBase._do_add_input_inner

    def _do_add_input_inner_schema_safe(self, input_bundle, input_index):
        was = self._has_schemas_broadcasted[input_index]
        orig_add(self, input_bundle, input_index)
        if (
            not was
            and self._has_schemas_broadcasted[input_index]
            and len(input_bundle.metadata) == 1
            and all(m.num_rows == 0 for m in input_bundle.metadata)
        ):
            schema = getattr(input_bundle, "schema", None)
            names = getattr(schema, "names", None) if schema is not None else None
            if not names:
                self._has_schemas_broadcasted[input_index] = False

    hs.HashShufflingOperatorBase._do_add_input_inner = (
        _do_add_input_inner_schema_safe
    )
    _applied = True
    return True
