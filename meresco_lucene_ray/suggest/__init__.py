from .autocomplete import build_suggestion_index, AutocompleteReader
from .spell import levenshtein, spell_suggest, spell_suggest_bucketed
from .store import SuggestionIndexStore

__all__ = [
    "build_suggestion_index",
    "AutocompleteReader",
    "levenshtein",
    "spell_suggest",
    "spell_suggest_bucketed",
    "SuggestionIndexStore",
]
