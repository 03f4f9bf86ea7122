"""Context-free grammar over the gSCAN vocabulary: rules, derivations, templates.

The derivation string serialization (``rules_str;lexicon_str``) is kept identical
to the reference format (cf. reference GroundedScan/grammar.py:179-285) — this
exact format appears in ``dataset.txt`` ("derivation") and ``predict.json``.
"""

from collections import namedtuple
from itertools import product
from typing import ClassVar, List

import numpy as np

from multimodal_seq2seq_gscan_tpu.gscan.types import (
    COLOR, ENTITY, EVENT, SIZE, LogicalForm, SemType, Term, Variable, Weights)

Nonterminal = namedtuple("Nonterminal", "name")
Terminal = namedtuple("Terminal", "name")

ROOT = Nonterminal("ROOT")
VP = Nonterminal("VP")
VV_intransitive = Nonterminal("VV_intransitive")
VV_transitive = Nonterminal("VV_transitive")
RB = Nonterminal("RB")
DP = Nonterminal("DP")
NP = Nonterminal("NP")
NN = Nonterminal("NN")
JJ = Nonterminal("JJ")

_VAR_COUNTER = [0]


def free_var(sem_type: SemType) -> Variable:
    name = "x{}".format(_VAR_COUNTER[0])
    _VAR_COUNTER[0] += 1
    return Variable(name, sem_type)


class Rule:
    """LHS -> RHS production with an ``instantiate`` defining its meaning."""

    def __init__(self, lhs: Nonterminal, rhs: List, max_recursion: int = 2):
        self.lhs = lhs
        self.rhs = rhs
        self.sem_type = None
        self.max_recursion = max_recursion

    def instantiate(self, *args, **kwargs):
        raise NotImplementedError()


class LexicalRule(Rule):
    """Nonterminal -> terminal word."""

    def __init__(self, lhs: Nonterminal, word: str, specs: Weights,
                 sem_type: SemType):
        super().__init__(lhs=lhs, rhs=[Terminal(word)], max_recursion=1)
        self.name = word
        self.sem_type = sem_type
        self.specs = specs

    def instantiate(self, meta=None, **kwargs) -> LogicalForm:
        var = free_var(self.sem_type)
        return LogicalForm(
            variables=(var,),
            terms=(Term(self.name, (var,), specs=self.specs, meta=meta),))

    def __repr__(self):
        return "{} -> {}".format(self.lhs.name, self.rhs[0].name)


class Root(Rule):
    def __init__(self):
        super().__init__(lhs=ROOT, rhs=[VP])

    def instantiate(self, child, **kwargs):
        return child

    def __repr__(self):
        return "ROOT -> VP"


class RootConj(Rule):
    def __init__(self, max_recursion=0):
        super().__init__(lhs=ROOT, rhs=[VP, Terminal("and"), ROOT],
                         max_recursion=max_recursion)

    def instantiate(self, left_child, right_child, **kwargs):
        return LogicalForm(
            variables=left_child.variables + right_child.variables,
            terms=(left_child.terms + right_child.terms
                   + (Term("seq", (left_child.head, right_child.head)),)))

    def __repr__(self):
        return "ROOT -> VP 'and' ROOT"


class VpWrapper(Rule):
    def __init__(self, max_recursion=0):
        super().__init__(lhs=VP, rhs=[VP, RB], max_recursion=max_recursion)

    def instantiate(self, rb, vp, meta, **kwargs):
        bound = rb.bind(vp.head)
        assert bound.variables[0] == vp.head
        return LogicalForm(variables=vp.variables + bound.variables[1:],
                           terms=vp.terms + bound.terms)

    def __repr__(self):
        return "VP -> VP RB"


class VpIntransitive(Rule):
    def __init__(self):
        super().__init__(lhs=VP, rhs=[VV_intransitive, Terminal("to"), DP])

    def instantiate(self, vv, dp, meta, **kwargs):
        role = Term("patient", (vv.head, dp.head))
        meta["arguments"].append(dp)
        return LogicalForm(variables=vv.variables + dp.variables,
                           terms=vv.terms + dp.terms + (role,))

    def __repr__(self):
        return "VP -> VV_intrans 'to' DP"


class VpTransitive(Rule):
    def __init__(self):
        super().__init__(lhs=VP, rhs=[VV_transitive, DP])

    def instantiate(self, vv, dp, meta, **kwargs):
        role = Term("patient", (vv.head, dp.head))
        meta["arguments"].append(dp)
        return LogicalForm(variables=vv.variables + dp.variables,
                           terms=vv.terms + dp.terms + (role,))

    def __repr__(self):
        return "VP -> VV_trans DP"


class Dp(Rule):
    def __init__(self):
        super().__init__(lhs=DP, rhs=[Terminal("a"), NP])

    def instantiate(self, np_child, **kwargs):
        return np_child

    def __repr__(self):
        return "DP -> 'a' NP"


class NpWrapper(Rule):
    def __init__(self, max_recursion=0):
        super().__init__(lhs=NP, rhs=[JJ, NP], max_recursion=max_recursion)

    def instantiate(self, jj, np_child, meta=None, **kwargs):
        bound = jj.bind(np_child.head)
        assert bound.variables[0] == np_child.head
        return LogicalForm(variables=np_child.variables + bound.variables[1:],
                           terms=np_child.terms + bound.terms)

    def __repr__(self):
        return "NP -> JJ NP"


class Np(Rule):
    def __init__(self):
        super().__init__(lhs=NP, rhs=[NN])

    def instantiate(self, nn, **kwargs):
        return nn

    def __repr__(self):
        return "NP -> NN"


class Derivation:
    """A constituency tree; serializes depth-first to the dataset.txt format."""

    def __init__(self, rule, children=None, meta=None):
        self.rule = rule
        self.lhs = rule.lhs
        self.children = children
        self.meta = meta if meta is not None else {}

    @classmethod
    def from_rules(cls, rules: list, symbol=ROOT, lexicon=None) -> "Derivation":
        if isinstance(symbol, Terminal):
            return symbol
        if symbol not in lexicon.keys():
            next_rule = rules.pop()
        else:
            next_rule = lexicon[symbol].pop()
        return Derivation(
            next_rule,
            tuple(cls.from_rules(rules, symbol=next_symbol, lexicon=lexicon)
                  for next_symbol in next_rule.rhs))

    def to_rules(self, rules: list, lexicon: dict):
        for child in self.children:
            if isinstance(child, Derivation):
                child.to_rules(rules, lexicon)
            else:
                lexicon[child] = [child]
        if isinstance(self.rule, LexicalRule):
            if self.rule.lhs not in lexicon:
                lexicon[self.rule.lhs] = [self.rule]
            else:
                lexicon[self.rule.lhs] = [self.rule] + lexicon[self.rule.lhs]
        else:
            rules.append(self.rule)

    def words(self) -> tuple:
        out = []
        for child in self.children:
            if isinstance(child, Terminal):
                out.append(child.name)
            else:
                out += child.words()
        return tuple(out)

    def meaning(self, arguments: list) -> LogicalForm:
        self.meta["arguments"] = arguments
        if not hasattr(self, "_cached_logical_form"):
            child_meanings = [child.meaning(arguments) for child in self.children
                              if isinstance(child, Derivation)]
            self._cached_logical_form = self.rule.instantiate(*child_meanings,
                                                              meta=self.meta)
        return self._cached_logical_form

    @classmethod
    def from_str(cls, rules_str: str, lexicon_str: str, grammar) -> "Derivation":
        rules_list = [grammar.rule_str_to_rules[r] for r in rules_str.split(",")]
        lexicon = {}
        for entry in lexicon_str.split(","):
            items = entry.split(":")
            symbol_type = items[0]
            for item in items[1:]:
                if symbol_type == "T":
                    new_terminal = Terminal(item)
                    lexicon[new_terminal] = [new_terminal]
                else:
                    rule = grammar.rule_str_to_rules[item]
                    if rule.lhs not in lexicon:
                        lexicon[rule.lhs] = [rule]
                    else:
                        lexicon[rule.lhs].append(rule)
        return cls.from_rules(rules_list, lexicon=lexicon)

    def __repr__(self):
        rules = []
        lexicon = {}
        self.to_rules(rules, lexicon)
        rules_str = ",".join(str(rule) for rule in rules)
        lexicon_list = []
        for key, value in lexicon.items():
            if isinstance(key, Nonterminal):
                symbol_str = "NT"
                for rhs_symbol in value:
                    symbol_str += ":{}".format(rhs_symbol)
                lexicon_list.append(symbol_str)
            else:
                lexicon_list.append("T:{}".format(value[0].name))
        return rules_str + ";" + ",".join(lexicon_list)


class Template:
    """A constituency tree without lexical rules; expands leftmost-first."""

    def __init__(self):
        self._left_values = []
        self._right_values = []
        self._leftmost_nonterminal = None
        self.rules = []

    def add_value(self, value, expandable: bool):
        if expandable and not self._leftmost_nonterminal:
            self._leftmost_nonterminal = value
        elif self._leftmost_nonterminal:
            self._right_values.append(value)
        else:
            self._left_values.append(value)

    def has_nonterminal(self) -> bool:
        return self._leftmost_nonterminal is not None

    def get_leftmost_nonterminal(self):
        assert self.has_nonterminal(), (
            "Trying to get a NT but none present in this derivation.")
        return self._leftmost_nonterminal

    def expand_leftmost_nonterminal(self, rule, expandables) -> "Template":
        new_template = Template()
        new_symbols = self._left_values + rule.rhs + self._right_values
        new_template.rules = self.rules.copy()
        new_template.rules.append(rule)
        for value in new_symbols:
            new_template.add_value(value, expandable=value in expandables)
        return new_template

    def to_derivation(self):
        assert not self.has_nonterminal(), (
            "Trying to write a non-terminal to a string.")
        self.rules.reverse()
        return self._left_values, self.rules


class Grammar:
    RULES = {
        "conjunction": [Root(), RootConj(max_recursion=2), VpWrapper(),
                        VpIntransitive(), VpTransitive(), Dp(),
                        NpWrapper(max_recursion=2), Np()],
        "adverb": [Root(), VpWrapper(), VpIntransitive(), VpTransitive(), Dp(),
                   NpWrapper(max_recursion=2), Np()],
        "normal": [Root(), VpIntransitive(), VpTransitive(), Dp(),
                   NpWrapper(max_recursion=2), Np()],
        "simple_trans": [Root(), VpTransitive(), Dp(), NpWrapper(max_recursion=1),
                         Np()],
        "simple_intrans": [Root(), VpIntransitive(), Dp(),
                           NpWrapper(max_recursion=1), Np()],
    }

    def __init__(self, vocabulary: ClassVar, max_recursion: int = 1,
                 type_grammar: str = "normal"):
        assert type_grammar in self.RULES, (
            "Specified unsupported type grammar {}".format(type_grammar))
        self.type_grammar = type_grammar
        if type_grammar == "simple_intrans":
            assert len(vocabulary.get_intransitive_verbs()) > 0, (
                "Please specify intransitive verbs.")
        elif type_grammar == "simple_trans":
            assert len(vocabulary.get_transitive_verbs()) > 0, (
                "Please specify transitive verbs.")
        self.rule_list = self.RULES[type_grammar] + self.lexical_rules(
            vocabulary.get_intransitive_verbs(), vocabulary.get_transitive_verbs(),
            vocabulary.get_adverbs(), vocabulary.get_nouns(),
            vocabulary.get_color_adjectives(), vocabulary.get_size_adjectives())
        nonterminals = {rule.lhs for rule in self.rule_list}
        self.rules = {nt: [] for nt in nonterminals}
        self.nonterminals = {nt.name: nt for nt in nonterminals}
        self.terminals = {}

        self.vocabulary = vocabulary
        self.rule_str_to_rules = {}
        for rule in self.rule_list:
            self.rules[rule.lhs].append(rule)
            self.rule_str_to_rules[str(rule)] = rule
        self.expandables = set(rule.lhs for rule in self.rule_list
                               if not isinstance(rule, LexicalRule))
        self.categories = {
            "manner": set(vocabulary.get_adverbs()),
            "shape": set(vocabulary.get_nouns()),
            "color": set(vocabulary.get_color_adjectives()),
            "size": set(vocabulary.get_size_adjectives()),
        }
        self.word_to_category = {}
        for category, words in self.categories.items():
            for word in words:
                self.word_to_category[word] = category

        self.max_recursion = max_recursion
        self.all_templates = []
        self.all_derivations = {}
        self.command_statistics = self.empty_command_statistics()

    @staticmethod
    def empty_command_statistics():
        return {VV_intransitive: {}, VV_transitive: {}, NN: {}, JJ: {}, RB: {}}

    def reset_grammar(self):
        self.command_statistics = self.empty_command_statistics()
        self.all_templates.clear()
        self.all_derivations.clear()

    def lexical_rules(self, verbs_intrans: List[str], verbs_trans: List[str],
                      adverbs: List[str], nouns: List[str],
                      color_adjectives: List[str],
                      size_adjectives: List[str]) -> list:
        assert size_adjectives or color_adjectives, (
            "Please specify words for at least one of size_adjectives or "
            "color_adjectives.")
        all_rules = []
        all_rules += [LexicalRule(lhs=VV_intransitive, word=verb, sem_type=EVENT,
                                  specs=Weights(action=verb, is_transitive=False))
                      for verb in verbs_intrans]
        all_rules += [LexicalRule(lhs=VV_transitive, word=verb, sem_type=EVENT,
                                  specs=Weights(action=verb, is_transitive=True))
                      for verb in verbs_trans]
        if self.type_grammar in ("adverb", "conjunction", "full"):
            all_rules += [LexicalRule(lhs=RB, word=word, sem_type=EVENT,
                                      specs=Weights(manner=word))
                          for word in adverbs]
        all_rules += [LexicalRule(lhs=NN, word=word, sem_type=ENTITY,
                                  specs=Weights(noun=word)) for word in nouns]
        if color_adjectives:
            all_rules += [LexicalRule(lhs=JJ, word=word, sem_type=ENTITY,
                                      specs=Weights(adjective_type=COLOR))
                          for word in color_adjectives]
        if size_adjectives:
            all_rules += [LexicalRule(lhs=JJ, word=word, sem_type=ENTITY,
                                      specs=Weights(adjective_type=SIZE))
                          for word in size_adjectives]
        return all_rules

    def sample(self, symbol=ROOT, last_rule=None, recursion=0):
        """Sample a random derivation from the grammar."""
        if isinstance(symbol, Terminal):
            return symbol
        nonterminal_rules = self.rules[symbol]
        if recursion == self.max_recursion - 1:
            nonterminal_rules = [r for r in nonterminal_rules if r != last_rule]
        next_rule = nonterminal_rules[np.random.randint(len(nonterminal_rules))]
        next_recursion = recursion + 1 if next_rule == last_rule else 0
        return Derivation(
            next_rule,
            tuple(self.sample(next_symbol, next_rule, next_recursion)
                  for next_symbol in next_rule.rhs),
            meta={"recursion": recursion})

    def generate_all(self, current_template: Template, all_templates: list,
                     rule_use_counter: dict):
        """Exhaustively expand templates, bounding recursion per rule."""
        if not current_template.has_nonterminal():
            all_templates.append(current_template.to_derivation())
            return
        leftmost_nonterminal = current_template.get_leftmost_nonterminal()
        for rule in self.rules[leftmost_nonterminal]:
            if isinstance(rule, LexicalRule):
                continue
            rule_use_counter_copy = rule_use_counter.copy()
            if rule in rule_use_counter_copy.keys():
                if rule_use_counter[rule] >= rule.max_recursion:
                    continue
                rule_use_counter_copy[rule] += 1
            else:
                rule_use_counter_copy[rule] = 1
            next_template = current_template.expand_leftmost_nonterminal(
                rule, self.expandables)
            self.generate_all(next_template, all_templates, rule_use_counter_copy)

    def form_commands_from_template(self, derivation_template: list,
                                    derivation_rules: list):
        """Instantiate a template with every compatible lexicon assignment.

        Repeated adjacent nonterminals (stacked JJs) get category-disjoint word
        sets so commands like 'the red red circle' are never generated.
        """
        replaced_template = []
        previous_symbol = None
        lexicon = {}
        for symbol in derivation_template:
            if isinstance(symbol, Nonterminal):
                if not self.rules.get(symbol):
                    # A category with no lexical rules (e.g. transitive verbs
                    # not specified): no command can instantiate this template.
                    return []
                possible_words = [s.name for s in self.rules[symbol]]
                for rule in self.rules[symbol]:
                    lexicon[rule.name] = rule
                if previous_symbol == symbol:
                    previous_words = replaced_template.pop()
                    first_words, second_words = self.split_on_category(previous_words)
                    replaced_template.append(first_words)
                    replaced_template.append(second_words)
                else:
                    replaced_template.append(possible_words)
            else:
                lexicon[symbol.name] = symbol
                replaced_template.append([symbol.name])
            previous_symbol = symbol

        all_commands = list(product(*replaced_template))
        all_derivations = []
        for command in all_commands:
            command_lexicon = {}
            for word, symbol in zip(command, derivation_template):
                if symbol not in command_lexicon:
                    command_lexicon[symbol] = [lexicon[word]]
                else:
                    command_lexicon[symbol] = [lexicon[word]] + command_lexicon[symbol]
                if isinstance(symbol, Nonterminal):
                    stats = self.command_statistics[symbol]
                    stats[word] = stats.get(word, 0) + 1
            derivation = Derivation.from_rules(derivation_rules.copy(), symbol=ROOT,
                                               lexicon=command_lexicon)
            assert " ".join(derivation.words()) == " ".join(command), (
                "Derivation and command not the same.")
            all_derivations.append(derivation)
        return all_derivations

    def generate_all_commands(self):
        initial_template = Template()
        initial_template.add_value(value=ROOT, expandable=True)
        self.generate_all(current_template=initial_template,
                          all_templates=self.all_templates, rule_use_counter={})
        for i, (derivation_template, derivation_rules) in enumerate(
                self.all_templates):
            self.all_derivations[i] = self.form_commands_from_template(
                derivation_template, derivation_rules)

    def split_on_category(self, words_list):
        first_category_words = [words_list[0]]
        second_category_words = []
        first_category = self.category(words_list[0])
        for word in words_list[1:]:
            if self.category(word) == first_category:
                first_category_words.append(word)
            else:
                second_category_words.append(word)
        return first_category_words, second_category_words

    def category(self, function):
        return self.word_to_category.get(function)

    def is_coherent(self, logical_form) -> bool:
        """A LF is coherent iff each variable's modifiers have unique categories."""
        for variable in logical_form.variables:
            functions = [t.function for t in logical_form.terms
                         if variable in t.arguments]
            categories = [self.category(f) for f in functions]
            categories = [c for c in categories if c is not None]
            if len(categories) != len(set(categories)):
                return False
        return True

    def __str__(self):
        return "".join(str(rule) + ";" for rule in self.rule_list)
