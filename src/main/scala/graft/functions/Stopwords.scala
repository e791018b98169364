package graft.functions

/** Stopword tables for the boilerplate classifier ([[HtmlClean]]) and the
  * quality scorers (T17 — the reference ships per-language tables with its
  * crawler cleaner, clean/en_stopwords.py + zh_stopwords.py; both are the
  * standard public lists: NLTK English, stopwords-iso Chinese). */
object Stopwords {

  /** The standard NLTK English stopword list (179 words). */
  val en: Set[String] = Set(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren",
    "weren't", "won", "won't", "wouldn", "wouldn't")

  /** Common Chinese function words (stopwords-iso zh core set). CJK text is
    * non-spaced, so the boilerplate classifier skips density checks for it
    * (html_extrator.py NON_SPACED_LANGUAGES); the table serves the
    * text-analysis quality scorers. */
  val zh: Set[String] = Set(
    "的", "了", "和", "是", "就", "都", "而", "及", "與", "着", "或",
    "一個", "沒有", "我們", "你們", "他們", "她們", "它們", "我", "你",
    "他", "她", "它", "这", "這", "那", "哪", "谁", "誰", "什么", "什麼",
    "怎么", "怎麼", "为什么", "為什麼", "在", "有", "人", "这个", "這個",
    "那个", "那個", "上", "下", "不", "也", "很", "到", "说", "說", "要",
    "去", "会", "會", "着呢", "没", "沒", "看", "好", "自己", "这样",
    "這樣", "那样", "那樣", "因为", "因為", "所以", "但是", "可是",
    "然而", "如果", "虽然", "雖然", "并且", "並且", "或者", "还是",
    "還是", "不过", "不過", "已经", "已經", "正在", "将", "將", "被",
    "把", "让", "讓", "从", "從", "向", "对", "對", "给", "給", "跟",
    "比", "在于", "于", "於", "之", "其", "此", "每", "各", "某", "另",
    "些", "么", "麼", "呢", "吧", "啊", "吗", "嗎", "哦", "嗯", "哈",
    "呀", "嘛", "罢了", "罷了", "而已", "来", "來", "过", "過", "地",
    "得", "所", "以", "能", "可以", "可能", "应该", "應該", "必须",
    "必須", "需要", "大家", "一些", "一样", "一樣", "一直", "一定",
    "非常", "十分", "最", "更", "再", "又", "还", "還", "只", "才",
    "刚", "剛", "总", "總", "曾", "曾经", "曾經")
}
