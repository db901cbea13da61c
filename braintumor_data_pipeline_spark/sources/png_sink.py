"""Custom Spark write format: ``df.write.format("pngdir")`` (SURVEY S9).

The reference writes PNGs as a side effect INSIDE its DoFn
(`/root/reference/dataflow_pipeline.py:84-85`) — no commit protocol, so
a retried bundle can leave partial or duplicate objects. This sink is
the corrected, Spark-native formulation via the Python DataSource
writer API: tasks stage their files, the DRIVER commits by renaming
staged files into place only after every task succeeded, and abort
removes all staging — so task retries, speculative duplicates, and job
failures never publish partial output. That stage-then-rename dance is
the same contract FileOutputCommitter (v1) gives Spark's built-in file
sinks, re-implemented here because custom sinks don't inherit it.

Input contract: rows with ``file_name`` (string) and ``content``
(binary, already-encoded PNG bytes — encode via sources/png.encode_png
upstream so the sink stays byte-agnostic). On a cluster, ``path`` must
be shared storage; rename-on-commit assumes same-volume rename (object
stores swap this for copy+delete or a manifest commit — the protocol
shape is identical).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

_STAGING = "_staging"


@dataclass
class _StagedFiles(WriterCommitMessage):
    staged: list


class PngDirWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pngdir sink requires a path")

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        task_tag = f"task-{ctx.partitionId()}-{ctx.taskAttemptId()}"
        stage_dir = os.path.join(self.path, _STAGING, task_tag)
        os.makedirs(stage_dir, exist_ok=True)
        staged = []
        for row in iterator:
            name = row.file_name
            if not name or row.content is None:
                raise ValueError(f"pngdir sink: bad row (name={name!r})")
            out = os.path.join(stage_dir, name)
            with open(out, "wb") as f:
                f.write(bytes(row.content))
            staged.append((out, name))
        return _StagedFiles(staged=staged)

    def commit(self, messages):
        os.makedirs(self.path, exist_ok=True)
        for m in messages:
            for staged_path, name in m.staged:
                os.replace(staged_path, os.path.join(self.path, name))
        shutil.rmtree(os.path.join(self.path, _STAGING), ignore_errors=True)

    def abort(self, messages):
        shutil.rmtree(os.path.join(self.path, _STAGING), ignore_errors=True)


class PngDirDataSource(DataSource):
    @classmethod
    def name(cls):
        return "pngdir"

    def writer(self, schema, overwrite):
        return PngDirWriter(self.options)
