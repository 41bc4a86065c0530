from .autocomplete import build_suggestion_index, AutocompleteReader
from .component import Suggestion, SuggestionIndexComponent
from .spell import levenshtein, spell_suggest, spell_suggest_bucketed
from .store import SuggestionIndexStore

__all__ = [
    "build_suggestion_index",
    "Suggestion",
    "SuggestionIndexComponent",
    "AutocompleteReader",
    "levenshtein",
    "spell_suggest",
    "spell_suggest_bucketed",
    "SuggestionIndexStore",
]
