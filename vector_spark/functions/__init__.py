"""VRL stdlib + codec function families.

A real (non-namespace) package on purpose: implicit namespace packages
import fine from the filesystem but NOT from a ``--py-files`` zip
(zipimport needs the ``__init__``), and executors only see the zip.
"""
