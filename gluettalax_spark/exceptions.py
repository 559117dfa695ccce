"""Engine exception hierarchy — mirrors the reference 1:1 minus boto
(reference: gluettalax.py:122-167, SURVEY.md §2.E E9).

The warning-vs-error split drives CLI exit codes exactly like the
reference's single handler (gluettalax.py:849-857): a
``GluettalaxWarning`` exits 0, any other ``GluettalaxException`` exits 1.
"""

from __future__ import annotations


class GluettalaxException(Exception):
    """Base class for every engine error (gluettalax.py:122-124)."""


class GluettalaxWarning(GluettalaxException):
    """Conditions reported but treated as success — exit code 0
    (gluettalax.py:127-129, 849-851)."""


class PartitionAlreadyExists(GluettalaxWarning):
    """Adding a partition that exists: warn, don't fail
    (gluettalax.py:158, 480-482)."""

    def __init__(self, message: str = "Partition already exists") -> None:
        super().__init__(message)


class CrawlerNotFound(GluettalaxException):
    """gluettalax.py:132-134 (raised at :198)."""


class CrawlerTimeout(GluettalaxException):
    """Sync crawl exceeded its timeout (gluettalax.py:137-139, 222-224)."""


class JobNotFound(GluettalaxException):
    """gluettalax.py:142-144 (raised in Job.__init__, :236-237)."""


class JobTimeout(GluettalaxException):
    """Sync job run exceeded its timeout (gluettalax.py:150-152, 267-268)."""


class JobConcurrentRunsExceeded(GluettalaxException):
    """Too many concurrent runs of one job (gluettalax.py:146-148, 259-260)."""


class TableNotFound(GluettalaxException):
    """gluettalax.py:154-156 (raised at :381, :410, :453, :491)."""


class PartitionNotFound(GluettalaxException):
    """Dropping a partition that doesn't exist (gluettalax.py:161-163, 494-497)."""


class InvalidOption(GluettalaxException):
    """CLI argument errors (gluettalax.py:165-167; raised throughout parse_args)."""


class GluettalaxCommandNotFound(GluettalaxException):
    """Unknown CLI command (gluettalax.py:830; raised from lookup_cmd :832-836)."""
