"""Runtime control plane: channel state machines, decode events,
identifiers, aliases, and traffic-channel management (role of the
reference's channel/state, module/decode/event, identifier/, alias/ and
*TrafficChannelManager layers — SURVEY.md sections 2.3).

Everything here is host-side Python and takes explicit timestamps (derived
from sample counts) instead of wall-clock time, so long captures replay
deterministically (SURVEY.md section 5, failure detection / replay).
"""
from .state import ChannelState, StateMachine
from .events import DecodeEvent, DecodeEventType, DecodeEventHistory
from .identifiers import (Identifier, IdentifierCollection, IdentifierRole,
                          IdentifierForm)
from .aliases import Alias, AliasList
from .traffic import TrafficChannelManager, FrequencyBand
