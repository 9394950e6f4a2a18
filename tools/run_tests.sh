#!/bin/bash
# TPU-safe test launcher: unset the axon plugin gate so pytest processes can
# NEVER dial the TPU tunnel (a second client wedges the active training
# session's RPC stream). Tests run on an 8-device virtual CPU mesh anyway.
exec env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE python -m pytest "$@"
