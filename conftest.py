# Repo-root conftest so scripts/tests resolve the in-repo package.
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
