from lucene_spark.analysis.analyzer import (  # noqa: F401
    Analyzer,
    CodeAnalyzer,
    SimpleAnalyzer,
    StandardAnalyzer,
    WhitespaceAnalyzer,
    get_analyzer,
)
from lucene_spark.analysis.filters import (  # noqa: F401  (registers the
    ASCIIFoldingFilter,  # composite analyzers as an import side effect)
    EdgeNGramFilter,
    EnglishMinimalStemFilter,
    FilteredAnalyzer,
    PorterStemFilter,
    ShingleFilter,
    StopFilter,
    SynonymCanonicalFilter,
    TokenFilter,
    ascii_fold,
    english_minimal_stem,
    english_minimal_stem_sql,
    porter_stem,
    register_analyzer,
)
from lucene_spark.analysis.snowball import (  # noqa: F401  (registers
    Porter2StemFilter,  # english_snowball / simple_snowball)
    porter2_stem,
)
from lucene_spark.analysis.graph import (  # noqa: F401  (registers
    GraphAnalyzer,  # simple_syngraph / ws_wdg_code as import side effects)
    SynonymGraphFilter,
    SynonymGraphMap,
    WordDelimiterGraphFilter,
    flatten_graph,
    graph_paths,
)
from lucene_spark.analysis.misc import (  # noqa: F401  (registers
    ApostropheFilter,  # turkish/french_elision/scandinavian analyzers)
    CommonGramsFilter,
    CommonGramsQueryFilter,
    DecimalDigitFilter,
    ElisionFilter,
    FingerprintFilter,
    GermanNormalizationFilter,
    HyphenatedWordsFilter,
    KeepWordFilter,
    ScandinavianFoldingFilter,
    ScandinavianNormalizationFilter,
    TurkishLowerCaseFilter,
)
from lucene_spark.analysis.pattern import (  # noqa: F401
    PatternAnalyzer,
    PatternCaptureGroupFilter,
    PatternReplaceFilter,
)
from lucene_spark.analysis.compound import (  # noqa: F401
    DictionaryCompoundWordFilter,
)
from lucene_spark.analysis.minhash import (  # noqa: F401
    MinHashFilter,
    murmur3_x64_128,
)
from lucene_spark.analysis.extras import (  # noqa: F401  (registers
    CapitalizationFilter,  # keyword/ngram/html_standard analyzers)
    CharFilter,
    CharFilteredAnalyzer,
    HTMLStripCharFilter,
    KeywordAnalyzer,
    LimitTokenCountFilter,
    MappingCharFilter,
    NGramAnalyzer,
    NGramFilter,
    PatternReplaceCharFilter,
    PhoneticFilter,
    TrimFilter,
    TruncateTokenFilter,
    refined_soundex,
    soundex,
)
from lucene_spark.analysis.phonetic import (  # noqa: F401  (registers
    caverphone2,  # the extra PhoneticFilter encoders on import)
    cologne_phonetic,
    metaphone,
    nysiis,
)
from lucene_spark.analysis.classic import (  # noqa: F401  (registers
    ClassicAnalyzer,  # classic / uax29_urlemail on import)
    UAX29URLEmailAnalyzer,
)
from lucene_spark.analysis.snowball_multi import (  # noqa: F401  (registers
    danish_stem,  # danish / norwegian / dutch analyzers on import)
    dutch_stem,
    norwegian_stem,
)
from lucene_spark.analysis.snowball_romance import (  # noqa: F401  (registers
    catalan_stem,  # romanian / catalan analyzers on import)
    romanian_stem,
)
from lucene_spark.analysis.indonesian import (  # noqa: F401  (registers
    indonesian_stem,  # the indonesian analyzer on import)
)
from lucene_spark.analysis.indic import (  # noqa: F401  (registers
    bengali_stem,  # bengali / telugu analyzers on import)
    telugu_stem,
)
from lucene_spark.analysis.greek import (  # noqa: F401  (registers
    greek_stem,  # the greek analyzer on import)
)
from lucene_spark.analysis.estonian import (  # noqa: F401  (registers
    estonian_stem,  # the estonian analyzer on import)
)
from lucene_spark.analysis.tamil import (  # noqa: F401  (registers
    tamil_stem,  # the tamil analyzer on import)
)
from lucene_spark.analysis.yiddish import (  # noqa: F401  (registers
    yiddish_stem,  # the yiddish analyzer on import)
)
from lucene_spark.analysis.turkish_stem import (  # noqa: F401  (registers
    turkish_stem,  # the turkish_snowball analyzer on import)
)
