"""Default stopword DATA for the contrib language analyzers.

Word lists (pure data, no code) reproduced from the reference
resource files under contrib/analyzers/common/src/resources/
org/apache/lucene/analysis/ so the analyzer chains drop exactly
the reference's default stop sets. Parsed with the loader rules
the reference applies (WordlistLoader: '#'-comment files for
ar/fa/bg/hi, snowball '|'-comment format for dutch_stop).
"""

# ar/stopwords.txt ('#' comments) — 119 words
ARABIC_STOP = frozenset((
    'من', 'ومن', 'منها', 'منه', 'في', 'وفي', 'فيها', 'فيه', 'و', 'ف', 'ثم',
    'او', 'أو', 'ب', 'بها', 'به', 'ا', 'أ', 'اى', 'اي', 'أي', 'أى', 'لا',
    'ولا', 'الا', 'ألا', 'إلا', 'لكن', 'ما', 'وما', 'كما', 'فما', 'عن', 'مع',
    'اذا', 'إذا', 'ان', 'أن', 'إن', 'انها', 'أنها', 'إنها', 'انه', 'أنه',
    'إنه', 'بان', 'بأن', 'فان', 'فأن', 'وان', 'وأن', 'وإن', 'التى', 'التي',
    'الذى', 'الذي', 'الذين', 'الى', 'الي', 'إلى', 'إلي', 'على', 'عليها',
    'عليه', 'اما', 'أما', 'إما', 'ايضا', 'أيضا', 'كل', 'وكل', 'لم', 'ولم',
    'لن', 'ولن', 'هى', 'هي', 'هو', 'وهى', 'وهي', 'وهو', 'فهى', 'فهي', 'فهو',
    'انت', 'أنت', 'لك', 'لها', 'له', 'هذه', 'هذا', 'تلك', 'ذلك', 'هناك',
    'كانت', 'كان', 'يكون', 'تكون', 'وكانت', 'وكان', 'غير', 'بعض', 'قد',
    'نحو', 'بين', 'بينما', 'منذ', 'ضمن', 'حيث', 'الان', 'الآن', 'خلال',
    'بعد', 'قبل', 'حتى', 'عند', 'عندما', 'لدى', 'جميع',
))

# fa/stopwords.txt ('#' comments) — 308 words
PERSIAN_STOP = frozenset((
    'انان', 'نداشته', 'سراسر', 'خياه', 'ايشان', 'وي', 'تاكنون', 'بيشتري',
    'دوم', 'پس', 'ناشي', 'وگو', 'يا', 'داشتند', 'سپس', 'هنگام', 'هرگز',
    'پنج', 'نشان', 'امسال', 'ديگر', 'گروهي', 'شدند', 'چطور', 'ده', 'و', 'دو',
    'نخستين', 'ولي', 'چرا', 'چه', 'وسط', 'ه', 'كدام', 'قابل', 'يك', 'رفت',
    'هفت', 'همچنين', 'در', 'هزار', 'بله', 'بلي', 'شايد', 'اما', 'شناسي',
    'گرفته', 'دهد', 'داشته', 'دانست', 'داشتن', 'خواهيم', 'ميليارد', 'وقتيكه',
    'امد', 'خواهد', 'جز', 'اورده', 'شده', 'بلكه', 'خدمات', 'شدن', 'برخي',
    'نبود', 'بسياري', 'جلوگيري', 'حق', 'كردند', 'نوعي', 'بعري', 'نكرده',
    'نظير', 'نبايد', 'بوده', 'بودن', 'داد', 'اورد', 'هست', 'جايي', 'شود',
    'دنبال', 'داده', 'بايد', 'سابق', 'هيچ', 'همان', 'انجا', 'كمتر', 'كجاست',
    'گردد', 'كسي', 'تر', 'مردم', 'تان', 'دادن', 'بودند', 'سري', 'جدا',
    'ندارند', 'مگر', 'يكديگر', 'دارد', 'دهند', 'بنابراين', 'هنگامي', 'سمت',
    'جا', 'انچه', 'خود', 'دادند', 'زياد', 'دارند', 'اثر', 'بدون', 'بهترين',
    'بيشتر', 'البته', 'به', 'براساس', 'بيرون', 'كرد', 'بعضي', 'گرفت', 'توي',
    'اي', 'ميليون', 'او', 'جريان', 'تول', 'بر', 'مانند', 'برابر', 'باشيم',
    'مدتي', 'گويند', 'اكنون', 'تا', 'تنها', 'جديد', 'چند', 'بي', 'نشده',
    'كردن', 'كردم', 'گويد', 'كرده', 'كنيم', 'نمي', 'نزد', 'روي', 'قصد',
    'فقط', 'بالاي', 'ديگران', 'اين', 'ديروز', 'توسط', 'سوم', 'ايم', 'دانند',
    'سوي', 'استفاده', 'شما', 'كنار', 'داريم', 'ساخته', 'طور', 'امده', 'رفته',
    'نخست', 'بيست', 'نزديك', 'طي', 'كنيد', 'از', 'انها', 'تمامي', 'داشت',
    'يكي', 'طريق', 'اش', 'چيست', 'روب', 'نمايد', 'گفت', 'چندين', 'چيزي',
    'تواند', 'ام', 'ايا', 'با', 'ان', 'ايد', 'ترين', 'اينكه', 'ديگري', 'راه',
    'هايي', 'بروز', 'همچنان', 'پاعين', 'كس', 'حدود', 'مختلف', 'مقابل', 'چيز',
    'گيرد', 'ندارد', 'ضد', 'همچون', 'سازي', 'شان', 'مورد', 'باره', 'مرسي',
    'خويش', 'برخوردار', 'چون', 'خارج', 'شش', 'هنوز', 'تحت', 'ضمن', 'هستيم',
    'گفته', 'فكر', 'بسيار', 'پيش', 'براي', 'روزهاي', 'انكه', 'نخواهد',
    'بالا', 'كل', 'وقتي', 'كي', 'چنين', 'كه', 'گيري', 'نيست', 'است', 'كجا',
    'كند', 'نيز', 'يابد', 'بندي', 'حتي', 'توانند', 'عقب', 'خواست', 'كنند',
    'بين', 'تمام', 'همه', 'ما', 'باشند', 'مثل', 'شد', 'اري', 'باشد', 'اره',
    'طبق', 'بعد', 'اگر', 'صورت', 'غير', 'جاي', 'بيش', 'ريزي', 'اند', 'زيرا',
    'چگونه', 'بار', 'لطفا', 'مي', 'درباره', 'من', 'ديده', 'همين', 'گذاري',
    'برداري', 'علت', 'گذاشته', 'هم', 'فوق', 'نه', 'ها', 'شوند', 'اباد',
    'همواره', 'هر', 'اول', 'خواهند', 'چهار', 'نام', 'امروز', 'مان', 'هاي',
    'قبل', 'كنم', 'سعي', 'تازه', 'را', 'هستند', 'زير', 'جلوي', 'عنوان',
    'بود',
))

# bg/stopwords.txt ('#' comments) — 190 words
BULGARIAN_STOP = frozenset((
    'а', 'аз', 'ако', 'ала', 'бе', 'без', 'беше', 'би', 'бил', 'била',
    'били', 'било', 'близо', 'бъдат', 'бъде', 'бяха', 'в', 'вас', 'ваш',
    'ваша', 'вероятно', 'вече', 'взема', 'ви', 'вие', 'винаги', 'все',
    'всеки', 'всички', 'всичко', 'всяка', 'във', 'въпреки', 'върху', 'г',
    'ги', 'главно', 'го', 'д', 'да', 'дали', 'до', 'докато', 'докога',
    'дори', 'досега', 'доста', 'е', 'едва', 'един', 'ето', 'за', 'зад',
    'заедно', 'заради', 'засега', 'затова', 'защо', 'защото', 'и', 'из',
    'или', 'им', 'има', 'имат', 'иска', 'й', 'каза', 'как', 'каква', 'какво',
    'както', 'какъв', 'като', 'кога', 'когато', 'което', 'които', 'кой',
    'който', 'колко', 'която', 'къде', 'където', 'към', 'ли', 'м', 'ме',
    'между', 'мен', 'ми', 'мнозина', 'мога', 'могат', 'може', 'моля',
    'момента', 'му', 'н', 'на', 'над', 'назад', 'най', 'направи', 'напред',
    'например', 'нас', 'не', 'него', 'нея', 'ни', 'ние', 'никой', 'нито',
    'но', 'някои', 'някой', 'няма', 'обаче', 'около', 'освен', 'особено',
    'от', 'отгоре', 'отново', 'още', 'пак', 'по', 'повече', 'повечето',
    'под', 'поне', 'поради', 'после', 'почти', 'прави', 'пред', 'преди',
    'през', 'при', 'пък', 'първо', 'с', 'са', 'само', 'се', 'сега', 'си',
    'скоро', 'след', 'сме', 'според', 'сред', 'срещу', 'сте', 'съм', 'със',
    'също', 'т', 'тази', 'така', 'такива', 'такъв', 'там', 'твой', 'те',
    'тези', 'ти', 'тн', 'то', 'това', 'тогава', 'този', 'той', 'толкова',
    'точно', 'трябва', 'тук', 'тъй', 'тя', 'тях', 'у', 'харесва', 'ч', 'че',
    'често', 'чрез', 'ще', 'щом', 'я',
))

# hi/stopwords.txt ('#' comments) — 227 words
HINDI_STOP = frozenset((
    'अंदर', 'अत', 'अपना', 'अपनी', 'अपने', 'अभी', 'आदि', 'आप', 'इत्यादि',
    'इन', 'इनका', 'इन्हीं', 'इन्हें', 'इन्हों', 'इस', 'इसका', 'इसकी', 'इसके',
    'इसमें', 'इसी', 'इसे', 'उन', 'उनका', 'उनकी', 'उनके', 'उनको', 'उन्हीं',
    'उन्हें', 'उन्हों', 'उस', 'उसके', 'उसी', 'उसे', 'एक', 'एवं', 'एस', 'ऐसे',
    'और', 'कई', 'कर', 'करता', 'करते', 'करना', 'करने', 'करें', 'कहते', 'कहा',
    'का', 'काफ़ी', 'कि', 'कितना', 'किन्हें', 'किन्हों', 'किया', 'किर', 'किस',
    'किसी', 'किसे', 'की', 'कुछ', 'कुल', 'के', 'को', 'कोई', 'कौन', 'कौनसा',
    'गया', 'घर', 'जब', 'जहाँ', 'जा', 'जितना', 'जिन', 'जिन्हें', 'जिन्हों',
    'जिस', 'जिसे', 'जीधर', 'जैसा', 'जैसे', 'जो', 'तक', 'तब', 'तरह', 'तिन',
    'तिन्हें', 'तिन्हों', 'तिस', 'तिसे', 'तो', 'था', 'थी', 'थे', 'दबारा',
    'दिया', 'दुसरा', 'दूसरे', 'दो', 'द्वारा', 'न', 'नहीं', 'ना', 'निहायत',
    'नीचे', 'ने', 'पर', 'पर', 'पहले', 'पूरा', 'पे', 'फिर', 'बनी', 'बही',
    'बहुत', 'बाद', 'बाला', 'बिलकुल', 'भी', 'भीतर', 'मगर', 'मानो', 'मे',
    'में', 'यदि', 'यह', 'यहाँ', 'यही', 'या', 'यिह', 'ये', 'रखें', 'रहा',
    'रहे', 'ऱ्वासा', 'लिए', 'लिये', 'लेकिन', 'व', 'वर्ग', 'वह', 'वह', 'वहाँ',
    'वहीं', 'वाले', 'वुह', 'वे', 'वग़ैरह', 'संग', 'सकता', 'सकते', 'सबसे',
    'सभी', 'साथ', 'साबुत', 'साभ', 'सारा', 'से', 'सो', 'ही', 'हुआ', 'हुई',
    'हुए', 'है', 'हैं', 'हो', 'होता', 'होती', 'होते', 'होना', 'होने', 'अपनि',
    'जेसे', 'होति', 'सभि', 'तिंहों', 'इंहों', 'दवारा', 'इसि', 'किंहें', 'थि',
    'उंहों', 'ओर', 'जिंहें', 'वहिं', 'अभि', 'बनि', 'हि', 'उंहिं', 'उंहें',
    'हें', 'वगेरह', 'एसे', 'रवासा', 'कोन', 'निचे', 'काफि', 'उसि', 'पुरा',
    'भितर', 'हे', 'बहि', 'वहां', 'कोइ', 'यहां', 'जिंहों', 'तिंहें', 'किसि',
    'कइ', 'यहि', 'इंहिं', 'जिधर', 'इंहें', 'अदि', 'इतयादि', 'हुइ', 'कोनसा',
    'इसकि', 'दुसरे', 'जहां', 'अप', 'किंहों', 'उनकि', 'भि', 'वरग', 'हुअ',
    'जेसा', 'नहिं',
))

# snowball/dutch_stop.txt ('|' comments) — 101 words
DUTCH_STOP = frozenset((
    'de', 'en', 'van', 'ik', 'te', 'dat', 'die', 'in', 'een', 'hij', 'het',
    'niet', 'zijn', 'is', 'was', 'op', 'aan', 'met', 'als', 'voor', 'had',
    'er', 'maar', 'om', 'hem', 'dan', 'zou', 'of', 'wat', 'mijn', 'men',
    'dit', 'zo', 'door', 'over', 'ze', 'zich', 'bij', 'ook', 'tot', 'je',
    'mij', 'uit', 'der', 'daar', 'haar', 'naar', 'heb', 'hoe', 'heeft',
    'hebben', 'deze', 'u', 'want', 'nog', 'zal', 'me', 'zij', 'nu', 'ge',
    'geen', 'omdat', 'iets', 'worden', 'toch', 'al', 'waren', 'veel', 'meer',
    'doen', 'toen', 'moet', 'ben', 'zonder', 'kan', 'hun', 'dus', 'alles',
    'onder', 'ja', 'eens', 'hier', 'wie', 'werd', 'altijd', 'doch', 'wordt',
    'wezen', 'kunnen', 'ons', 'zelf', 'tegen', 'na', 'reeds', 'wil', 'kon',
    'niets', 'uw', 'iemand', 'geweest', 'andere',
))


# --- in-source stop arrays from the reference analyzer classes ---
# de/GermanAnalyzer.java GERMAN_STOP_WORDS — 48 entries
GERMAN_STOP = frozenset((
    'einer', 'eine', 'eines', 'einem', 'einen', 'der', 'die', 'das', 'dass',
    'daß', 'du', 'er', 'sie', 'es', 'was', 'wer', 'wie', 'wir', 'und',
    'oder', 'ohne', 'mit', 'am', 'im', 'in', 'aus', 'auf', 'ist', 'sein',
    'war', 'wird', 'ihr', 'ihre', 'ihres', 'als', 'für', 'von', 'mit',
    'dich', 'dir', 'mich', 'mir', 'mein', 'sein', 'kein', 'durch', 'wegen',
    'wird',
))

# fr/FrenchAnalyzer.java FRENCH_STOP_WORDS — 217 entries
FRENCH_STOP = frozenset((
    'a', 'afin', 'ai', 'ainsi', 'après', 'attendu', 'au', 'aujourd',
    'auquel', 'aussi', 'autre', 'autres', 'aux', 'auxquelles', 'auxquels',
    'avait', 'avant', 'avec', 'avoir', 'c', 'car', 'ce', 'ceci', 'cela',
    'celle', 'celles', 'celui', 'cependant', 'certain', 'certaine',
    'certaines', 'certains', 'ces', 'cet', 'cette', 'ceux', 'chez', 'ci',
    'combien', 'comme', 'comment', 'concernant', 'contre', 'd', 'dans', 'de',
    'debout', 'dedans', 'dehors', 'delà', 'depuis', 'derrière', 'des',
    'désormais', 'desquelles', 'desquels', 'dessous', 'dessus', 'devant',
    'devers', 'devra', 'divers', 'diverse', 'diverses', 'doit', 'donc',
    'dont', 'du', 'duquel', 'durant', 'dès', 'elle', 'elles', 'en', 'entre',
    'environ', 'est', 'et', 'etc', 'etre', 'eu', 'eux', 'excepté', 'hormis',
    'hors', 'hélas', 'hui', 'il', 'ils', 'j', 'je', 'jusqu', 'jusque', 'l',
    'la', 'laquelle', 'le', 'lequel', 'les', 'lesquelles', 'lesquels',
    'leur', 'leurs', 'lorsque', 'lui', 'là', 'ma', 'mais', 'malgré', 'me',
    'merci', 'mes', 'mien', 'mienne', 'miennes', 'miens', 'moi', 'moins',
    'mon', 'moyennant', 'même', 'mêmes', 'n', 'ne', 'ni', 'non', 'nos',
    'notre', 'nous', 'néanmoins', 'nôtre', 'nôtres', 'on', 'ont', 'ou',
    'outre', 'où', 'par', 'parmi', 'partant', 'pas', 'passé', 'pendant',
    'plein', 'plus', 'plusieurs', 'pour', 'pourquoi', 'proche', 'près',
    'puisque', 'qu', 'quand', 'que', 'quel', 'quelle', 'quelles', 'quels',
    'qui', 'quoi', 'quoique', 'revoici', 'revoilà', 's', 'sa', 'sans',
    'sauf', 'se', 'selon', 'seront', 'ses', 'si', 'sien', 'sienne',
    'siennes', 'siens', 'sinon', 'soi', 'soit', 'son', 'sont', 'sous',
    'suivant', 'sur', 'ta', 'te', 'tes', 'tien', 'tienne', 'tiennes',
    'tiens', 'toi', 'ton', 'tous', 'tout', 'toute', 'toutes', 'tu', 'un',
    'une', 'va', 'vers', 'voici', 'voilà', 'vos', 'votre', 'vous', 'vu',
    'vôtre', 'vôtres', 'y', 'à', 'ça', 'ès', 'été', 'être', 'ô',
))

# ru/RussianAnalyzer.java RUSSIAN_STOP_WORDS_30 — 101 entries
RUSSIAN_STOP = frozenset((
    'а', 'без', 'более', 'бы', 'был', 'была', 'были', 'было', 'быть', 'в',
    'вам', 'вас', 'весь', 'во', 'вот', 'все', 'всего', 'всех', 'вы', 'где',
    'да', 'даже', 'для', 'до', 'его', 'ее', 'ей', 'ею', 'если', 'есть',
    'еще', 'же', 'за', 'здесь', 'и', 'из', 'или', 'им', 'их', 'к', 'как',
    'ко', 'когда', 'кто', 'ли', 'либо', 'мне', 'может', 'мы', 'на', 'надо',
    'наш', 'не', 'него', 'нее', 'нет', 'ни', 'них', 'но', 'ну', 'о', 'об',
    'однако', 'он', 'она', 'они', 'оно', 'от', 'очень', 'по', 'под', 'при',
    'с', 'со', 'так', 'также', 'такой', 'там', 'те', 'тем', 'то', 'того',
    'тоже', 'той', 'только', 'том', 'ты', 'у', 'уже', 'хотя', 'чего', 'чей',
    'чем', 'что', 'чтобы', 'чье', 'чья', 'эта', 'эти', 'это', 'я',
))

# br/BrazilianAnalyzer.java BRAZILIAN_STOP_WORDS — 128 entries
BRAZILIAN_STOP = frozenset((
    'a', 'ainda', 'alem', 'ambas', 'ambos', 'antes', 'ao', 'aonde', 'aos',
    'apos', 'aquele', 'aqueles', 'as', 'assim', 'com', 'como', 'contra',
    'contudo', 'cuja', 'cujas', 'cujo', 'cujos', 'da', 'das', 'de', 'dela',
    'dele', 'deles', 'demais', 'depois', 'desde', 'desta', 'deste', 'dispoe',
    'dispoem', 'diversa', 'diversas', 'diversos', 'do', 'dos', 'durante',
    'e', 'ela', 'elas', 'ele', 'eles', 'em', 'entao', 'entre', 'essa',
    'essas', 'esse', 'esses', 'esta', 'estas', 'este', 'estes', 'ha', 'isso',
    'isto', 'logo', 'mais', 'mas', 'mediante', 'menos', 'mesma', 'mesmas',
    'mesmo', 'mesmos', 'na', 'nas', 'nao', 'nas', 'nem', 'nesse', 'neste',
    'nos', 'o', 'os', 'ou', 'outra', 'outras', 'outro', 'outros', 'pelas',
    'pelas', 'pelo', 'pelos', 'perante', 'pois', 'por', 'porque', 'portanto',
    'proprio', 'propios', 'quais', 'qual', 'qualquer', 'quando', 'quanto',
    'que', 'quem', 'quer', 'se', 'seja', 'sem', 'sendo', 'seu', 'seus',
    'sob', 'sobre', 'sua', 'suas', 'tal', 'tambem', 'teu', 'teus', 'toda',
    'todas', 'todo', 'todos', 'tua', 'tuas', 'tudo', 'um', 'uma', 'umas',
    'uns',
))

# cz/CzechAnalyzer.java CZECH_STOP_WORDS — 172 entries
CZECH_STOP = frozenset((
    'a', 's', 'k', 'o', 'i', 'u', 'v', 'z', 'dnes', 'cz', 'tímto', 'budeš',
    'budem', 'byli', 'jseš', 'můj', 'svým', 'ta', 'tomto', 'tohle', 'tuto',
    'tyto', 'jej', 'zda', 'proč', 'máte', 'tato', 'kam', 'tohoto', 'kdo',
    'kteří', 'mi', 'nám', 'tom', 'tomuto', 'mít', 'nic', 'proto', 'kterou',
    'byla', 'toho', 'protože', 'asi', 'ho', 'naši', 'napište', 're', 'což',
    'tím', 'takže', 'svých', 'její', 'svými', 'jste', 'aj', 'tu', 'tedy',
    'teto', 'bylo', 'kde', 'ke', 'pravé', 'ji', 'nad', 'nejsou', 'či', 'pod',
    'téma', 'mezi', 'přes', 'ty', 'pak', 'vám', 'ani', 'když', 'však', 'neg',
    'jsem', 'tento', 'článku', 'články', 'aby', 'jsme', 'před', 'pta',
    'jejich', 'byl', 'ještě', 'až', 'bez', 'také', 'pouze', 'první', 'vaše',
    'která', 'nás', 'nový', 'tipy', 'pokud', 'může', 'strana', 'jeho', 'své',
    'jiné', 'zprávy', 'nové', 'není', 'vás', 'jen', 'podle', 'zde', 'už',
    'být', 'více', 'bude', 'již', 'než', 'který', 'by', 'které', 'co',
    'nebo', 'ten', 'tak', 'má', 'při', 'od', 'po', 'jsou', 'jak', 'další',
    'ale', 'si', 'se', 've', 'to', 'jako', 'za', 'zpět', 'ze', 'do', 'pro',
    'je', 'na', 'atd', 'atp', 'jakmile', 'přičemž', 'já', 'on', 'ona', 'ono',
    'oni', 'ony', 'my', 'vy', 'jí', 'ji', 'mě', 'mne', 'jemu', 'tomu', 'těm',
    'těmu', 'němu', 'němuž', 'jehož', 'jíž', 'jelikož', 'jež', 'jakož',
    'načež',
))

# cjk/CJKAnalyzer.java STOP_WORDS — 36 entries
CJK_STOP = frozenset((
    'a', 'and', 'are', 'as', 'at', 'be', 'but', 'by', 'for', 'if', 'in',
    'into', 'is', 'it', 'no', 'not', 'of', 'on', 'or', 's', 'such', 't',
    'that', 'the', 'their', 'then', 'there', 'these', 'they', 'this', 'to',
    'was', 'will', 'with', '', 'www',
))

# el/GreekAnalyzer.java GREEK_STOP_WORDS — 75 entries
GREEK_STOP = frozenset((
    'ο', 'η', 'το', 'οι', 'τα', 'του', 'τησ', 'των', 'τον', 'την', 'και',
    'κι', 'κ', 'ειμαι', 'εισαι', 'ειναι', 'ειμαστε', 'ειστε', 'στο', 'στον',
    'στη', 'στην', 'μα', 'αλλα', 'απο', 'για', 'προσ', 'με', 'σε', 'ωσ',
    'παρα', 'αντι', 'κατα', 'μετα', 'θα', 'να', 'δε', 'δεν', 'μη', 'μην',
    'επι', 'ενω', 'εαν', 'αν', 'τοτε', 'που', 'πωσ', 'ποιοσ', 'ποια', 'ποιο',
    'ποιοι', 'ποιεσ', 'ποιων', 'ποιουσ', 'αυτοσ', 'αυτη', 'αυτο', 'αυτοι',
    'αυτων', 'αυτουσ', 'αυτεσ', 'αυτα', 'εκεινοσ', 'εκεινη', 'εκεινο',
    'εκεινοι', 'εκεινεσ', 'εκεινα', 'εκεινων', 'εκεινουσ', 'οπωσ', 'ομωσ',
    'ισωσ', 'οσο', 'οτι',
))


# tr/stopwords.txt ('#' comments) — 209 words
TURKISH_STOP = frozenset((
    'acaba', 'altmış', 'altı', 'ama', 'ancak', 'arada', 'aslında', 'ayrıca',
    'bana', 'bazı', 'belki', 'ben', 'benden', 'beni', 'benim', 'beri', 'beş',
    'bile', 'bin', 'bir', 'birçok', 'biri', 'birkaç', 'birkez', 'birşey',
    'birşeyi', 'biz', 'bize', 'bizden', 'bizi', 'bizim', 'böyle', 'böylece',
    'bu', 'buna', 'bunda', 'bundan', 'bunlar', 'bunları', 'bunların', 'bunu',
    'bunun', 'burada', 'çok', 'çünkü', 'da', 'daha', 'dahi', 'de', 'defa',
    'değil', 'diğer', 'diye', 'doksan', 'dokuz', 'dolayı', 'dolayısıyla',
    'dört', 'edecek', 'eden', 'ederek', 'edilecek', 'ediliyor', 'edilmesi',
    'ediyor', 'eğer', 'elli', 'en', 'etmesi', 'etti', 'ettiği', 'ettiğini',
    'gibi', 'göre', 'halen', 'hangi', 'hatta', 'hem', 'henüz', 'hep',
    'hepsi', 'her', 'herhangi', 'herkesin', 'hiç', 'hiçbir', 'için', 'iki',
    'ile', 'ilgili', 'ise', 'işte', 'itibaren', 'itibariyle', 'kadar',
    'karşın', 'katrilyon', 'kendi', 'kendilerine', 'kendini', 'kendisi',
    'kendisine', 'kendisini', 'kez', 'ki', 'kim', 'kimden', 'kime', 'kimi',
    'kimse', 'kırk', 'milyar', 'milyon', 'mu', 'mü', 'mı', 'nasıl', 'ne',
    'neden', 'nedenle', 'nerde', 'nerede', 'nereye', 'niye', 'niçin', 'o',
    'olan', 'olarak', 'oldu', 'olduğu', 'olduğunu', 'olduklarını', 'olmadı',
    'olmadığı', 'olmak', 'olması', 'olmayan', 'olmaz', 'olsa', 'olsun',
    'olup', 'olur', 'olursa', 'oluyor', 'on', 'ona', 'ondan', 'onlar',
    'onlardan', 'onları', 'onların', 'onu', 'onun', 'otuz', 'oysa', 'öyle',
    'pek', 'rağmen', 'sadece', 'sanki', 'sekiz', 'seksen', 'sen', 'senden',
    'seni', 'senin', 'siz', 'sizden', 'sizi', 'sizin', 'şey', 'şeyden',
    'şeyi', 'şeyler', 'şöyle', 'şu', 'şuna', 'şunda', 'şundan', 'şunları',
    'şunu', 'tarafından', 'trilyon', 'tüm', 'üç', 'üzere', 'var', 'vardı',
    've', 'veya', 'ya', 'yani', 'yapacak', 'yapılan', 'yapılması', 'yapıyor',
    'yapmak', 'yaptı', 'yaptığı', 'yaptığını', 'yaptıkları', 'yedi',
    'yerine', 'yetmiş', 'yine', 'yirmi', 'yoksa', 'yüz', 'zaten',
))

# snowball/spanish_stop.txt ('|' comments) — 308 words
SPANISH_STOP = frozenset((
    'de', 'la', 'que', 'el', 'en', 'y', 'a', 'los', 'del', 'se', 'las',
    'por', 'un', 'para', 'con', 'no', 'una', 'su', 'al', 'lo', 'como', 'más',
    'pero', 'sus', 'le', 'ya', 'o', 'este', 'sí', 'porque', 'esta', 'entre',
    'cuando', 'muy', 'sin', 'sobre', 'también', 'me', 'hasta', 'hay',
    'donde', 'quien', 'desde', 'todo', 'nos', 'durante', 'todos', 'uno',
    'les', 'ni', 'contra', 'otros', 'ese', 'eso', 'ante', 'ellos', 'e',
    'esto', 'mí', 'antes', 'algunos', 'qué', 'unos', 'yo', 'otro', 'otras',
    'otra', 'él', 'tanto', 'esa', 'estos', 'mucho', 'quienes', 'nada',
    'muchos', 'cual', 'poco', 'ella', 'estar', 'estas', 'algunas', 'algo',
    'nosotros', 'mi', 'mis', 'tú', 'te', 'ti', 'tu', 'tus', 'ellas',
    'nosotras', 'vosotros', 'vosotras', 'os', 'mío', 'mía', 'míos', 'mías',
    'tuyo', 'tuya', 'tuyos', 'tuyas', 'suyo', 'suya', 'suyos', 'suyas',
    'nuestro', 'nuestra', 'nuestros', 'nuestras', 'vuestro', 'vuestra',
    'vuestros', 'vuestras', 'esos', 'esas', 'estoy', 'estás', 'está',
    'estamos', 'estáis', 'están', 'esté', 'estés', 'estemos', 'estéis',
    'estén', 'estaré', 'estarás', 'estará', 'estaremos', 'estaréis',
    'estarán', 'estaría', 'estarías', 'estaríamos', 'estaríais', 'estarían',
    'estaba', 'estabas', 'estábamos', 'estabais', 'estaban', 'estuve',
    'estuviste', 'estuvo', 'estuvimos', 'estuvisteis', 'estuvieron',
    'estuviera', 'estuvieras', 'estuviéramos', 'estuvierais', 'estuvieran',
    'estuviese', 'estuvieses', 'estuviésemos', 'estuvieseis', 'estuviesen',
    'estando', 'estado', 'estada', 'estados', 'estadas', 'estad', 'he',
    'has', 'ha', 'hemos', 'habéis', 'han', 'haya', 'hayas', 'hayamos',
    'hayáis', 'hayan', 'habré', 'habrás', 'habrá', 'habremos', 'habréis',
    'habrán', 'habría', 'habrías', 'habríamos', 'habríais', 'habrían',
    'había', 'habías', 'habíamos', 'habíais', 'habían', 'hube', 'hubiste',
    'hubo', 'hubimos', 'hubisteis', 'hubieron', 'hubiera', 'hubieras',
    'hubiéramos', 'hubierais', 'hubieran', 'hubiese', 'hubieses',
    'hubiésemos', 'hubieseis', 'hubiesen', 'habiendo', 'habido', 'habida',
    'habidos', 'habidas', 'soy', 'eres', 'es', 'somos', 'sois', 'son', 'sea',
    'seas', 'seamos', 'seáis', 'sean', 'seré', 'serás', 'será', 'seremos',
    'seréis', 'serán', 'sería', 'serías', 'seríamos', 'seríais', 'serían',
    'era', 'eras', 'éramos', 'erais', 'eran', 'fui', 'fuiste', 'fue',
    'fuimos', 'fuisteis', 'fueron', 'fuera', 'fueras', 'fuéramos', 'fuerais',
    'fueran', 'fuese', 'fueses', 'fuésemos', 'fueseis', 'fuesen', 'siendo',
    'sido', 'tengo', 'tienes', 'tiene', 'tenemos', 'tenéis', 'tienen',
    'tenga', 'tengas', 'tengamos', 'tengáis', 'tengan', 'tendré', 'tendrás',
    'tendrá', 'tendremos', 'tendréis', 'tendrán', 'tendría', 'tendrías',
    'tendríamos', 'tendríais', 'tendrían', 'tenía', 'tenías', 'teníamos',
    'teníais', 'tenían', 'tuve', 'tuviste', 'tuvo', 'tuvimos', 'tuvisteis',
    'tuvieron', 'tuviera', 'tuvieras', 'tuviéramos', 'tuvierais', 'tuvieran',
    'tuviese', 'tuvieses', 'tuviésemos', 'tuvieseis', 'tuviesen', 'teniendo',
    'tenido', 'tenida', 'tenidos', 'tenidas', 'tened',
))


# snowball danish_stop.txt (contrib resources, BSD; whitespace-split like the
# reference's snowball word-set loader — multiple words per line) — 94 entries
DANISH_STOP = frozenset((
    "ad", "af", "alle", "alt", "anden", "at", "blev", "blive", "bliver",
    "da", "de", "dem", "den", "denne", "der", "deres", "det", "dette",
    "dig", "din", "disse", "dog", "du", "efter", "eller", "en", "end",
    "er", "et", "for", "fra", "ham", "han", "hans", "har", "havde", "have",
    "hende", "hendes", "her", "hos", "hun", "hvad", "hvis", "hvor", "i",
    "ikke", "ind", "jeg", "jer", "jo", "kunne", "man", "mange", "med",
    "meget", "men", "mig", "min", "mine", "mit", "mod", "ned", "noget",
    "nogle", "nu", "når", "og", "også", "om", "op", "os", "over", "på",
    "selv", "sig", "sin", "sine", "sit", "skal", "skulle", "som", "sådan",
    "thi", "til", "ud", "under", "var", "vi", "vil", "ville", "vor",
    "være", "været",
))


# snowball norwegian_stop.txt (contrib resources, BSD; whitespace-split like the
# reference's snowball word-set loader — multiple words per line) — 172 entries
NORWEGIAN_STOP = frozenset((
    "alle", "at", "av", "bare", "begge", "ble", "blei", "bli", "blir",
    "blitt", "både", "båe", "da", "de", "deg", "dei", "deim", "deira",
    "deires", "dem", "den", "denne", "der", "dere", "deres", "det",
    "dette", "di", "din", "disse", "ditt", "du", "dykk", "dykkar", "då",
    "eg", "ein", "eit", "eitt", "eller", "elles", "en", "enn", "er", "et",
    "ett", "etter", "for", "fordi", "fra", "før", "ha", "hadde", "han",
    "hans", "har", "hennar", "henne", "hennes", "her", "hjå", "ho", "hoe",
    "honom", "hoss", "hossen", "hun", "hva", "hvem", "hver", "hvilke",
    "hvilken", "hvis", "hvor", "hvordan", "hvorfor", "i", "ikke", "ikkje",
    "ingen", "ingi", "inkje", "inn", "inni", "ja", "jeg", "kan", "kom",
    "korleis", "korso", "kun", "kunne", "kva", "kvar", "kvarhelst", "kven",
    "kvi", "kvifor", "man", "mange", "me", "med", "medan", "meg", "meget",
    "mellom", "men", "mi", "min", "mine", "mitt", "mot", "mykje", "ned",
    "no", "noe", "noen", "noka", "noko", "nokon", "nokor", "nokre", "nå",
    "når", "og", "også", "om", "opp", "oss", "over", "på", "samme", "seg",
    "selv", "si", "sia", "sidan", "siden", "sin", "sine", "sitt", "sjøl",
    "skal", "skulle", "slik", "so", "som", "somme", "somt", "så", "sånn",
    "til", "um", "upp", "ut", "uten", "var", "vart", "varte", "ved",
    "vere", "verte", "vi", "vil", "ville", "vore", "vors", "vort", "vår",
    "være", "vært", "å",
))


# snowball swedish_stop.txt (contrib resources, BSD; whitespace-split like the
# reference's snowball word-set loader — multiple words per line) — 114 entries
SWEDISH_STOP = frozenset((
    "alla", "allt", "att", "av", "blev", "bli", "blir", "blivit", "de",
    "dem", "den", "denna", "deras", "dess", "dessa", "det", "detta", "dig",
    "din", "dina", "ditt", "du", "där", "då", "efter", "ej", "eller", "en",
    "er", "era", "ert", "ett", "från", "för", "ha", "hade", "han", "hans",
    "har", "henne", "hennes", "hon", "honom", "hur", "här", "i", "icke",
    "ingen", "inom", "inte", "jag", "ju", "kan", "kunde", "man", "med",
    "mellan", "men", "mig", "min", "mina", "mitt", "mot", "mycket", "ni",
    "nu", "när", "någon", "något", "några", "och", "om", "oss", "på",
    "samma", "sedan", "sig", "sin", "sina", "sitta", "själv", "skulle",
    "som", "så", "sådan", "sådana", "sådant", "till", "under", "upp", "ut",
    "utan", "vad", "var", "vara", "varför", "varit", "varje", "vars",
    "vart", "vem", "vi", "vid", "vilka", "vilkas", "vilken", "vilket",
    "vår", "våra", "vårt", "än", "är", "åt", "över",
))


# snowball finnish_stop.txt (contrib resources, BSD; whitespace-split like the
# reference's snowball word-set loader — multiple words per line) — 229 entries
FINNISH_STOP = frozenset((
    "ei", "eivät", "emme", "en", "et", "ette", "että", "he", "heidän",
    "heidät", "heihin", "heille", "heillä", "heiltä", "heissä", "heistä",
    "heitä", "hän", "häneen", "hänelle", "hänellä", "häneltä", "hänen",
    "hänessä", "hänestä", "hänet", "häntä", "itse", "ja", "johon",
    "joiden", "joihin", "joiksi", "joilla", "joille", "joilta", "joina",
    "joissa", "joista", "joita", "joka", "joksi", "jolla", "jolle",
    "jolta", "jona", "jonka", "jos", "jossa", "josta", "jota", "jotka",
    "kanssa", "keiden", "keihin", "keiksi", "keille", "keillä", "keiltä",
    "keinä", "keissä", "keistä", "keitä", "keneen", "keneksi", "kenelle",
    "kenellä", "keneltä", "kenen", "kenenä", "kenessä", "kenestä", "kenet",
    "ketkä", "ketä", "koska", "kuin", "kuka", "kun", "me", "meidän",
    "meidät", "meihin", "meille", "meillä", "meiltä", "meissä", "meistä",
    "meitä", "mihin", "miksi", "mikä", "mille", "millä", "miltä", "minkä",
    "minua", "minulla", "minulle", "minulta", "minun", "minussa",
    "minusta", "minut", "minuun", "minä", "missä", "mistä", "mitkä",
    "mitä", "mukaan", "mutta", "ne", "niiden", "niihin", "niiksi",
    "niille", "niillä", "niiltä", "niin", "niinä", "niissä", "niistä",
    "niitä", "noiden", "noihin", "noiksi", "noilla", "noille", "noilta",
    "noin", "noina", "noissa", "noista", "noita", "nuo", "nyt", "näiden",
    "näihin", "näiksi", "näille", "näillä", "näiltä", "näinä", "näissä",
    "näistä", "näitä", "nämä", "ole", "olemme", "olen", "olet", "olette",
    "oli", "olimme", "olin", "olisi", "olisimme", "olisin", "olisit",
    "olisitte", "olisivat", "olit", "olitte", "olivat", "olla", "olleet",
    "ollut", "on", "ovat", "poikki", "se", "sekä", "sen", "siihen",
    "siinä", "siitä", "siksi", "sille", "sillä", "siltä", "sinua",
    "sinulla", "sinulle", "sinulta", "sinun", "sinussa", "sinusta",
    "sinut", "sinuun", "sinä", "sitä", "tai", "tallä", "te", "teidän",
    "teidät", "teihin", "teille", "teillä", "teiltä", "teissä", "teistä",
    "teitä", "tuo", "tuohon", "tuoksi", "tuolla", "tuolle", "tuolta",
    "tuon", "tuona", "tuossa", "tuosta", "tuotä", "tähän", "täksi",
    "tälle", "tältä", "tämä", "tämän", "tänä", "tässä", "tästä", "tätä",
    "vaan", "vai", "vaikka", "yli",
))
