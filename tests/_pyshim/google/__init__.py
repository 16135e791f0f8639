"""Namespace bridge to a vendored pure-Python ``google.protobuf``.

This container ships no installed protobuf, but the Cloud SDK's
App Engine runtime (present at a fixed system path) vendors one. Only
the ``google.*`` namespace is bridged — appending that directory's
``google`` package to THIS package's ``__path__`` — so none of the SDK's
other top-level modules can leak onto ``sys.path``. Test
infrastructure only: product code never imports this; the
``transformWithStateInPandas`` lane stays importorskip-gated where
protobuf is genuinely absent.
"""

import os

_APPENGINE_GOOGLE = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"
if os.path.isdir(_APPENGINE_GOOGLE):
    __path__.append(_APPENGINE_GOOGLE)
