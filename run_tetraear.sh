#!/usr/bin/env sh
# TetraEar-TPU quick launcher — the Linux counterpart of the reference's
# run_tetraear.bat (which launched the Qt GUI).  Starts the interactive
# terminal UI; pass any `tetraear_tpu tui` flags through, e.g.:
#
#   ./run_tetraear.sh -f 392.225 --synthetic
#   ./run_tetraear.sh --iq-file capture.cf32 --no-afc
#
# With no SDR/replay args it opens on live BladeRF capture at the
# default frequency, like the reference launcher.
cd "$(dirname "$0")" || exit 1
exec python -m tetraear_tpu tui "$@"
