"""Embedded seed corpora for deterministic model training.

A couple of dozen everyday sentences per language, written for this repo
(public knowledge, no external data).  They train (a) the char-trigram
language-ID profiles and (b) the English bigram LM used for perplexity
scoring.  Deliberately small: the goal is deterministic, testable behavior
on synthetic corpora, with the model TABLES swappable for real fastText /
KenLM artifacts on a production cluster (same kernel code path).
"""

from __future__ import annotations

EN_SENTENCES: tuple[str, ...] = (
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "She walked to the market early in the morning to buy fresh bread and milk.",
    "Scientists have discovered a new species of butterfly in the mountain forests.",
    "The company announced strong quarterly results despite difficult market conditions.",
    "Children love to play outside when the weather is warm and sunny.",
    "He spent the whole weekend reading books about the history of ancient Rome.",
    "The government plans to invest more money in public transportation next year.",
    "Our team worked very hard to finish the project before the deadline.",
    "The restaurant on the corner serves the best pasta in the whole city.",
    "Many people believe that regular exercise improves both health and mood.",
    "The teacher explained the lesson clearly so that every student could understand.",
    "After the storm passed, the sky cleared and a rainbow appeared over the hills.",
    "We are planning a long trip through the national parks this summer.",
    "The museum opened a new exhibition about the art of the twentieth century.",
    "Engineers tested the bridge carefully before opening it to heavy traffic.",
    "The old library keeps thousands of rare manuscripts in its quiet halls.",
    "Farmers in the valley grow wheat, corn, and many kinds of vegetables.",
    "The committee will meet on Thursday to discuss the new budget proposal.",
    "A gentle wind moved through the trees as the sun set behind the mountains.",
    "Most visitors enjoy walking along the beach and watching the fishing boats.",
    "The doctor advised him to rest for a few days and drink plenty of water.",
    "Technology has changed the way people work, travel, and communicate every day.",
)

ES_SENTENCES: tuple[str, ...] = (
    "El rápido zorro marrón salta sobre el perro perezoso cerca del río.",
    "Ella caminó al mercado temprano por la mañana para comprar pan fresco.",
    "Los científicos descubrieron una nueva especie de mariposa en los bosques.",
    "La empresa anunció buenos resultados a pesar de las condiciones difíciles.",
    "A los niños les encanta jugar afuera cuando hace buen tiempo y sol.",
    "Pasó todo el fin de semana leyendo libros sobre la historia de Roma.",
    "El gobierno planea invertir más dinero en el transporte público el próximo año.",
    "Nuestro equipo trabajó muy duro para terminar el proyecto antes del plazo.",
    "El restaurante de la esquina sirve la mejor pasta de toda la ciudad.",
    "Mucha gente cree que el ejercicio regular mejora la salud y el ánimo.",
    "La maestra explicó la lección con claridad para que todos la entendieran.",
    "Después de la tormenta, el cielo se despejó y apareció un arcoíris.",
    "Estamos planeando un largo viaje por los parques nacionales este verano.",
    "El museo abrió una nueva exposición sobre el arte del siglo veinte.",
    "Los ingenieros probaron el puente con cuidado antes de abrirlo al tráfico.",
    "La vieja biblioteca guarda miles de manuscritos raros en sus salas.",
    "Los agricultores del valle cultivan trigo, maíz y muchas verduras.",
    "El comité se reunirá el jueves para discutir el nuevo presupuesto.",
    "Un viento suave movía los árboles mientras el sol se ponía tras las montañas.",
    "La mayoría de los visitantes disfruta caminar por la playa al atardecer.",
)

DE_SENTENCES: tuple[str, ...] = (
    "Der schnelle braune Fuchs springt über den faulen Hund am Flussufer.",
    "Sie ging früh am Morgen zum Markt, um frisches Brot und Milch zu kaufen.",
    "Wissenschaftler haben eine neue Schmetterlingsart in den Bergwäldern entdeckt.",
    "Das Unternehmen meldete trotz schwieriger Marktlage starke Quartalszahlen.",
    "Kinder spielen gern draußen, wenn das Wetter warm und sonnig ist.",
    "Er verbrachte das ganze Wochenende mit Büchern über die Geschichte Roms.",
    "Die Regierung will nächstes Jahr mehr Geld in den Nahverkehr investieren.",
    "Unser Team hat sehr hart gearbeitet, um das Projekt rechtzeitig abzuschließen.",
    "Das Restaurant an der Ecke serviert die beste Pasta der ganzen Stadt.",
    "Viele Menschen glauben, dass regelmäßige Bewegung Gesundheit und Laune verbessert.",
    "Die Lehrerin erklärte die Lektion so deutlich, dass alle Schüler sie verstanden.",
    "Nach dem Sturm klarte der Himmel auf und ein Regenbogen erschien über den Hügeln.",
    "Wir planen diesen Sommer eine lange Reise durch die Nationalparks.",
    "Das Museum eröffnete eine neue Ausstellung über die Kunst des zwanzigsten Jahrhunderts.",
    "Die Ingenieure prüften die Brücke sorgfältig, bevor sie für den Verkehr freigegeben wurde.",
    "Die alte Bibliothek bewahrt tausende seltene Handschriften in ihren stillen Sälen.",
    "Die Bauern im Tal bauen Weizen, Mais und viele Gemüsesorten an.",
    "Der Ausschuss trifft sich am Donnerstag, um den neuen Haushalt zu besprechen.",
    "Ein sanfter Wind bewegte die Bäume, während die Sonne hinter den Bergen versank.",
    "Die meisten Besucher genießen den Spaziergang am Strand bei Sonnenuntergang.",
)

FR_SENTENCES: tuple[str, ...] = (
    "Le rapide renard brun saute par-dessus le chien paresseux près de la rivière.",
    "Elle est allée au marché tôt le matin pour acheter du pain frais et du lait.",
    "Les scientifiques ont découvert une nouvelle espèce de papillon dans les forêts.",
    "L'entreprise a annoncé de bons résultats malgré des conditions difficiles.",
    "Les enfants adorent jouer dehors quand le temps est chaud et ensoleillé.",
    "Il a passé tout le week-end à lire des livres sur l'histoire de Rome.",
    "Le gouvernement prévoit d'investir davantage dans les transports publics.",
    "Notre équipe a travaillé très dur pour terminer le projet avant la date limite.",
    "Le restaurant du coin sert les meilleures pâtes de toute la ville.",
    "Beaucoup de gens pensent que l'exercice régulier améliore la santé et l'humeur.",
    "La maîtresse a expliqué la leçon clairement pour que chaque élève comprenne.",
    "Après la tempête, le ciel s'est dégagé et un arc-en-ciel est apparu.",
    "Nous préparons un long voyage à travers les parcs nationaux cet été.",
    "Le musée a ouvert une nouvelle exposition sur l'art du vingtième siècle.",
    "Les ingénieurs ont testé le pont avec soin avant de l'ouvrir à la circulation.",
    "La vieille bibliothèque conserve des milliers de manuscrits rares.",
    "Les fermiers de la vallée cultivent du blé, du maïs et beaucoup de légumes.",
    "Le comité se réunira jeudi pour discuter du nouveau budget.",
    "Un vent doux agitait les arbres tandis que le soleil se couchait derrière les montagnes.",
    "La plupart des visiteurs aiment marcher le long de la plage au coucher du soleil.",
)

# Chinese is additionally gated by CJK-character fraction in langid.py; the
# sentences still contribute a trigram profile.
ZH_SENTENCES: tuple[str, ...] = (
    "敏捷的棕色狐狸跳过了河边那只懒惰的狗。",
    "她一大早就去市场买新鲜的面包和牛奶。",
    "科学家在山区森林里发现了一种新的蝴蝶。",
    "尽管市场环境困难,公司仍公布了强劲的季度业绩。",
    "天气温暖晴朗的时候,孩子们喜欢在外面玩耍。",
    "他整个周末都在读关于古罗马历史的书。",
    "政府计划明年在公共交通上投入更多资金。",
    "我们的团队非常努力地在截止日期前完成了项目。",
    "街角的那家餐馆做的面条是全城最好的。",
    "许多人相信经常锻炼能改善健康和心情。",
    "老师把课讲得很清楚,每个学生都能听懂。",
    "暴风雨过后,天空放晴,山丘上出现了一道彩虹。",
    "我们计划今年夏天去国家公园长途旅行。",
    "博物馆开设了一个关于二十世纪艺术的新展览。",
    "工程师在大桥通车前进行了仔细的测试。",
    "老图书馆的安静大厅里保存着数千份珍贵的手稿。",
    "山谷里的农民种植小麦、玉米和许多蔬菜。",
    "委员会将于星期四开会讨论新的预算提案。",
    "太阳落到山后时,微风吹动着树木。",
    "大多数游客喜欢在海滩上散步,看渔船归来。",
)

IT_SENTENCES: tuple[str, ...] = (
    "La rapida volpe marrone salta sopra il cane pigro vicino al fiume.",
    "È andata al mercato presto la mattina per comprare pane fresco e latte.",
    "Gli scienziati hanno scoperto una nuova specie di farfalla nei boschi di montagna.",
    "L'azienda ha annunciato risultati trimestrali solidi nonostante il mercato difficile.",
    "Ai bambini piace giocare fuori quando il tempo è caldo e soleggiato.",
    "Ha passato tutto il fine settimana a leggere libri sulla storia di Roma antica.",
    "Il governo prevede di investire più denaro nei trasporti pubblici il prossimo anno.",
    "La nostra squadra ha lavorato molto duramente per finire il progetto in tempo.",
    "Il ristorante all'angolo serve la migliore pasta di tutta la città.",
    "Molte persone credono che l'esercizio regolare migliori la salute e l'umore.",
    "La maestra ha spiegato la lezione chiaramente così che ogni studente potesse capire.",
    "Dopo la tempesta il cielo si è schiarito e un arcobaleno è apparso sulle colline.",
    "Stiamo pianificando un lungo viaggio attraverso i parchi nazionali questa estate.",
    "Il museo ha aperto una nuova mostra sull'arte del ventesimo secolo.",
    "Gli ingegneri hanno testato il ponte con attenzione prima di aprirlo al traffico.",
    "La vecchia biblioteca conserva migliaia di manoscritti rari nelle sue sale silenziose.",
    "I contadini della valle coltivano grano, mais e molti tipi di verdure.",
    "Il comitato si riunirà giovedì per discutere la nuova proposta di bilancio.",
    "Un vento gentile muoveva gli alberi mentre il sole tramontava dietro le montagne.",
    "La maggior parte dei visitatori ama passeggiare lungo la spiaggia al tramonto.",
)

PT_SENTENCES: tuple[str, ...] = (
    "A rápida raposa marrom salta sobre o cão preguiçoso perto do rio.",
    "Ela foi ao mercado cedo de manhã para comprar pão fresco e leite.",
    "Os cientistas descobriram uma nova espécie de borboleta nas florestas da montanha.",
    "A empresa anunciou resultados trimestrais fortes apesar do mercado difícil.",
    "As crianças adoram brincar lá fora quando o tempo está quente e ensolarado.",
    "Ele passou o fim de semana inteiro lendo livros sobre a história da Roma antiga.",
    "O governo planeja investir mais dinheiro no transporte público no próximo ano.",
    "A nossa equipe trabalhou muito para terminar o projeto antes do prazo.",
    "O restaurante da esquina serve a melhor massa de toda a cidade.",
    "Muitas pessoas acreditam que o exercício regular melhora a saúde e o humor.",
    "A professora explicou a lição claramente para que todos os alunos entendessem.",
    "Depois da tempestade o céu clareou e um arco-íris apareceu sobre as colinas.",
    "Estamos planejando uma longa viagem pelos parques nacionais neste verão.",
    "O museu abriu uma nova exposição sobre a arte do século vinte.",
    "Os engenheiros testaram a ponte com cuidado antes de abri-la ao tráfego.",
    "A velha biblioteca guarda milhares de manuscritos raros em suas salas silenciosas.",
    "Os agricultores do vale cultivam trigo, milho e muitos tipos de legumes.",
    "O comitê vai se reunir na quinta-feira para discutir a nova proposta de orçamento.",
    "Um vento suave movia as árvores enquanto o sol se punha atrás das montanhas.",
    "A maioria dos visitantes gosta de caminhar pela praia ao pôr do sol.",
)

CORPORA: dict[str, tuple[str, ...]] = {
    "en": EN_SENTENCES,
    "es": ES_SENTENCES,
    "de": DE_SENTENCES,
    "fr": FR_SENTENCES,
    "it": IT_SENTENCES,
    "pt": PT_SENTENCES,
    "zh": ZH_SENTENCES,
}
