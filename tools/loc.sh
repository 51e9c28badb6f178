#!/bin/bash
# Reproducible LoC diagnostic with ONE exclusion rule applied to both
# sides (ADVICE r4: the r4 VERDICT's reference-core figure was not
# reproducible because the test filter was ambiguous).
#
# Rule: count *.py *.c *.cc *.cpp *.h *.hpp; exclude any path whose
# basename or any directory component contains "test" (case-insensitive).
#
#   repo side:      /root/repo          (package + native + tools, no tests/)
#   reference core: /root/reference/sw + /root/reference/hw/sim
set -euo pipefail

count() {
  # NUL-delimited: the reference has a directory with a space in its
  # name ("sw/INT8 quantization"), which breaks whitespace xargs.
  find "$@" \( -name '*.py' -o -name '*.c' -o -name '*.cc' \
       -o -name '*.cpp' -o -name '*.h' -o -name '*.hpp' \) -type f \
       -print0 \
    | grep -zviE '(^|/)[^/]*test[^/]*(/|$)' \
    | xargs -0 cat 2>/dev/null | wc -l
}

repo=$(count /root/repo/resnet_accel_tpu /root/repo/native/src \
             /root/repo/native/include /root/repo/tools \
             /root/repo/bench.py /root/repo/__graft_entry__.py)
ref=$(count /root/reference/sw /root/reference/hw/sim)
echo "repo non-test LoC:          $repo"
echo "reference core non-test LoC: $ref"
